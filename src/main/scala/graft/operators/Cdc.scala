package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CHANGE DATA FEED between two snapshots of a keyed table — the
  * Delta Lake `table_changes(t, v1, v2)` shape, computed over plain
  * versioned parquet marts ([[graft.Mat]] retains [[graft.Mat.KeepVersions]]
  * versions; reference analog: a dbt `table` model rebuilt by the next
  * `dbt run`, whose consumers want "what changed since the last run"
  * without re-reading both full snapshots downstream).
  *
  * Emits the after-image schema plus `_change_type`:
  *   - `insert`           — key present only in `after`
  *   - `delete`           — key present only in `before`
  *   - `update_preimage`  — key in both, any non-key column differs
  *   - `update_postimage` — ditto (one pre + one post row per update)
  * Unchanged rows emit nothing, so the feed is |Δ|-sized — the whole
  * point at 100 TB: downstream consumers (incremental aggregates,
  * search-index upserts, cache invalidation) process the delta, not
  * the snapshot.
  *
  * Scale shape: ONE full-outer sort-merge join on the key. When both
  * snapshots are versions of a mart bucketed on the key (the
  * [[graft.Mat.table]] `bucketBy` seam), the join needs NO shuffle at
  * all — both sides were hash-clustered at write time, so diffing two
  * 100 TB snapshots is a co-located per-bucket merge (CdcSpec asserts
  * the zero-exchange plan). Column comparison is null-safe (`<=>`)
  * and stays inside whole-stage codegen; the two update rows come
  * from one array-explode of the joined row, not a second join.
  *
  * Keys are assumed non-null (mart primary-key contract — enforced
  * upstream by [[Contracts]] NOT NULL constraints where declared).
  */
object Cdc {

  def changes(before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = after.columns.toSeq
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"cdc: snapshot schemas differ: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    require(keys.nonEmpty && keys.forall(cols.contains), s"cdc: bad keys $keys")
    val nonKeys = cols.filterNot(keys.contains)

    // normalize the before side to the after side's column order so
    // the pre/post image structs are field-compatible
    val b = before.select(cols.map(col): _*).alias("b")
    val a = after.alias("a")
    val keyCond = keys.map(k => col(s"b.$k") === col(s"a.$k")).reduce(_ && _)
    val bPresent = col(s"b.${keys.head}").isNotNull
    val aPresent = col(s"a.${keys.head}").isNotNull
    val unchanged = nonKeys.map(c => col(s"b.$c") <=> col(s"a.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val bRow = struct(cols.map(c => col(s"b.$c").as(c)): _*)
    val aRow = struct(cols.map(c => col(s"a.$c").as(c)): _*)

    b.join(a, keyCond, "full_outer")
      // matched-and-identical rows (the overwhelming majority between
      // consecutive snapshots) drop here, before the explode
      .filter(!(bPresent && aPresent && unchanged))
      .select(explode(
        when(!bPresent, array(struct(lit("insert").as("_change_type"), aRow.as("r"))))
          .when(!aPresent, array(struct(lit("delete").as("_change_type"), bRow.as("r"))))
          .otherwise(array(
            struct(lit("update_preimage").as("_change_type"), bRow.as("r")),
            struct(lit("update_postimage").as("_change_type"), aRow.as("r"))))).as("c"))
      .select(cols.map(c => col(s"c.r.$c").as(c)) :+ col("c._change_type"): _*)
  }

  /** INCREMENTAL VIEW MAINTENANCE from a change feed — the reason a
    * CDF exists: a grouped aggregate over the new snapshot computed as
    * `stored aggregate of the old snapshot ⊕ Δ-sized merge`, never a
    * full re-aggregation. Each change row carries weight +1 (insert /
    * update_postimage) or −1 (delete / update_preimage), so per group
    * the count moves by Σw and the sum by Σ(value·w); groups whose
    * maintained count reaches 0 disappear (multiset semantics — the
    * classic delta-rule for SUM/COUNT aggregates).
    *
    * `baseAgg` must be the (groupKey, n, total) aggregate of the
    * BEFORE snapshot — at 100 TB that's a tiny materialized table
    * ([[graft.Mat]] barrier), and this merge touches only it plus the
    * feed: cost O(|groups| + |Δ|), independent of snapshot size.
    * CdcSpec asserts maintained == recomputed-from-after equality. */
  def maintainAgg(baseAgg: DataFrame, cdc: DataFrame,
                  groupKey: String, valueCol: String): DataFrame = {
    // zero literals take the stored aggregate's own exact type, so the
    // merge is scale-preserving for any decimal the caller sums
    val totType = baseAgg.schema("total").dataType
    val w = when(col("_change_type").isin("insert", "update_postimage"), lit(1))
      .otherwise(lit(-1))
    val deltaAgg = cdc
      .select(col(groupKey), w.as("w"), col(valueCol))
      .groupBy(groupKey)
      .agg(sum(col("w")).as("dn"),
        sum(col(valueCol) * col("w")).as("ds"))
    baseAgg.join(deltaAgg, Seq(groupKey), "full_outer")
      .select(col(groupKey),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(0).cast(totType)) +
          coalesce(col("ds"), lit(0).cast(totType))).as("total"))
      .filter(col("n") > 0)
  }
}
