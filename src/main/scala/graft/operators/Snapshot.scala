package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** SCD Type-2 snapshots — dbt's `snapshot` materialization (check
  * strategy), the change-history operator the reference TOOL ships
  * even though the reference project defines none (`snapshots/` would
  * sit beside `models/`; SURVEY §2 scopes it out of parity, so this
  * is beyond-parity surface).
  *
  * Contract (dbt semantics): the snapshot table holds one row per
  * (key, version) with `dbt_valid_from` / `dbt_valid_to`, where
  * `dbt_valid_to IS NULL` marks the current version. Each run diffs
  * the CURRENT source state against the open rows:
  *
  *  - new key        → open a row (valid_from = runTs);
  *  - changed check-columns → close the open row (valid_to = runTs)
  *    and open a new one;
  *  - unchanged      → carry the open row through untouched;
  *  - key gone from source → close the open row (dbt's
  *    invalidate_hard_deletes=true behavior).
  *
  * Scale: one full-outer join between the open rows and the source on
  * the key — both sides shuffle-partitioned by key, closed history is
  * appended untouched (at 100 TB: the closed partition is
  * read-through, never rewritten; pair with Mat.refresh for the
  * atomic publish). Change detection hashes the check columns with
  * a null-safe per-column md5 digest instead of comparing N columns
  * row-wise.
  */
object Snapshot {

  val ValidFrom = "dbt_valid_from"
  val ValidTo = "dbt_valid_to"

  /** Null-safe, concatenation-unambiguous change hash: each column is
    * hashed to a fixed-width digest first (nulls become the literal
    * "null", which no 32-hex digest can equal), then the digests are
    * joined with a separator — no value/boundary ambiguity across
    * columns. */
  private def checkHash(cols: Seq[String]) =
    md5(concat_ws("|",
      cols.map(c => coalesce(md5(col(c).cast("string")), lit("null"))): _*))

  /** First run: every source row opens at `runTs`. */
  def init(source: DataFrame, runTs: java.sql.Timestamp): DataFrame =
    source
      .withColumn(ValidFrom, lit(runTs).cast(TimestampType))
      .withColumn(ValidTo, lit(null).cast(TimestampType))

  /** One snapshot run: `prev` is the full snapshot table (open +
    * closed rows), `source` the current state at `runTs`. Returns the
    * new full snapshot table. `checkCols` are the change-detection
    * columns (dbt's `check_cols`). */
  def run(prev: DataFrame, source: DataFrame, key: String,
          checkCols: Seq[String], runTs: java.sql.Timestamp): DataFrame = {
    val dataCols = source.columns.toSeq
    require(dataCols.contains(key), s"source lacks key column $key")
    val closed = prev.filter(col(ValidTo).isNotNull)
    val open = prev.filter(col(ValidTo).isNull)

    val openH = open.withColumn("__h", checkHash(checkCols))
    val srcH = source.withColumn("__h_src", checkHash(checkCols))
      .select(col(key).as("__k_src") +: col("__h_src") +:
        dataCols.filterNot(_ == key).map(c => col(c).as(s"__src_$c")): _*)
    val joined = openH.join(srcH, col(key) === col("__k_src"), "full_outer")

    // open rows that survive unchanged
    val carried = joined
      .filter(col(key).isNotNull && col("__k_src").isNotNull &&
        col("__h") === col("__h_src"))
      .select(open.columns.map(col): _*)
    // open rows to close: changed, or deleted from the source
    val toClose = joined
      .filter(col(key).isNotNull &&
        (col("__k_src").isNull || col("__h") =!= col("__h_src")))
      .select(open.columns.map(col): _*)
      .withColumn(ValidTo, lit(runTs).cast(TimestampType))
    // rows to open: brand-new keys, or the new version of changed keys
    val toOpen = joined
      .filter(col("__k_src").isNotNull &&
        (col(key).isNull || col("__h") =!= col("__h_src")))
      .select(col("__k_src").as(key) +:
        dataCols.filterNot(_ == key).map(c => col(s"__src_$c").as(c)): _*)
      .withColumn(ValidFrom, lit(runTs).cast(TimestampType))
      .withColumn(ValidTo, lit(null).cast(TimestampType))

    closed.unionByName(carried).unionByName(toClose).unionByName(toOpen)
  }

  /** One snapshot run with dbt's TIMESTAMP strategy: instead of
    * hashing check-columns, a source row is "changed" iff its
    * `updatedAtCol` is strictly newer than the open row's — the cheap
    * strategy when the upstream system stamps mutations (no column
    * comparison at all, so schema drift in payload columns never
    * breaks change detection). Deletes still close open rows
    * (invalidate_hard_deletes), and rows whose stamp did NOT advance
    * carry through even if payload columns differ — exactly dbt's
    * documented trade: the stamp is trusted, not audited.
    *
    * Same single full-outer-join scale shape as [[run]]. */
  def runTimestamp(prev: DataFrame, source: DataFrame, key: String,
                   updatedAtCol: String,
                   runTs: java.sql.Timestamp): DataFrame = {
    val dataCols = source.columns.toSeq
    require(dataCols.contains(key), s"source lacks key column $key")
    require(dataCols.contains(updatedAtCol),
      s"source lacks updated-at column $updatedAtCol")
    val closed = prev.filter(col(ValidTo).isNotNull)
    val open = prev.filter(col(ValidTo).isNull)

    val srcSel = source.select(col(key).as("__k_src") +:
      dataCols.filterNot(_ == key).map(c => col(c).as(s"__src_$c")): _*)
    val joined = open.join(srcSel, col(key) === col("__k_src"), "full_outer")
    val advanced = col(s"__src_$updatedAtCol") > col(updatedAtCol)

    val carried = joined
      .filter(col(key).isNotNull && col("__k_src").isNotNull && !advanced)
      .select(open.columns.map(col): _*)
    val toClose = joined
      .filter(col(key).isNotNull && (col("__k_src").isNull || advanced))
      .select(open.columns.map(col): _*)
      .withColumn(ValidTo, lit(runTs).cast(TimestampType))
    val toOpen = joined
      .filter(col("__k_src").isNotNull && (col(key).isNull || advanced))
      .select(col("__k_src").as(key) +:
        dataCols.filterNot(_ == key).map(c => col(s"__src_$c").as(c)): _*)
      .withColumn(ValidFrom, lit(runTs).cast(TimestampType))
      .withColumn(ValidTo, lit(null).cast(TimestampType))

    closed.unionByName(carried).unionByName(toClose).unionByName(toOpen)
  }
}
