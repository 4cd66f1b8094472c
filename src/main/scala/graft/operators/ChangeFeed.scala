package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Change-data feed between two retained versions of a versioned mart
  * — the row-level diff a table format exposes as CDF/CDC, recovered
  * here from [[graft.Mat]]'s plain-parquet version layout (the same
  * trio Delta ships: time travel = `tableVersion`, atomic replace =
  * the view repoint, change feed = this). Downstream incremental
  * consumers (a sync into a serving store, a cache invalidator, a
  * training-data delta export) read the diff instead of the table.
  *
  * Output: the mart's columns plus `_change_type` ∈ {insert, delete,
  * update_preimage, update_postimage} — Delta's CDF vocabulary — with
  * updates emitting BOTH images (the pre row as it was, the post row
  * as it is).
  *
  * Scale: one full outer join keyed by the unique key and a null-safe
  * struct comparison — O(|from| + |to|) shuffled once; unchanged rows
  * are dropped before the explode, so the feed's size is the churn,
  * not the table.
  */
object ChangeFeed {

  def changes(spark: SparkSession, sfDir: String, name: String,
              uniqueKey: String, fromVersion: Int, toVersion: Int): DataFrame = {
    require(fromVersion < toVersion,
      s"fromVersion $fromVersion must precede toVersion $toVersion")
    val from = graft.Mat.tableVersion(spark, sfDir, name, fromVersion)
    val to = graft.Mat.tableVersion(spark, sfDir, name, toVersion)
    require(from.columns.sameElements(to.columns),
      s"version schemas diverge: ${from.columns.toSeq} vs ${to.columns.toSeq}")
    // key integrity guard: SQL joins never match NULL keys (an
    // unchanged null-key row would surface as a spurious delete +
    // insert) and duplicate keys cross-product per key — both are
    // wrong-CDC generators, so fail fast. One aggregation per side.
    Seq(fromVersion -> from, toVersion -> to).foreach { case (v, df) =>
      val s = df.agg(
        count(lit(1)).as("rows"),
        count(col(uniqueKey)).as("nonnull"),
        countDistinct(col(uniqueKey)).as("distinct")).head()
      require(s.getLong(0) == s.getLong(1),
        s"$name v$v has null $uniqueKey values; change feed needs a total key")
      require(s.getLong(1) == s.getLong(2),
        s"$name v$v has duplicate $uniqueKey values; change feed needs a unique key")
    }
    val cols = from.columns.toSeq
    val pre = from.select(col(uniqueKey).as("__cf_key"), struct(cols.map(col): _*).as("__cf_pre"))
    val post = to.select(col(uniqueKey).as("__cf_key"), struct(cols.map(col): _*).as("__cf_post"))
    pre.join(post, Seq("__cf_key"), "full_outer")
      .select(
        when(col("__cf_post").isNull,
          array(struct(lit("delete").as("t"), col("__cf_pre").as("r"))))
        .when(col("__cf_pre").isNull,
          array(struct(lit("insert").as("t"), col("__cf_post").as("r"))))
        .when(!(col("__cf_pre") <=> col("__cf_post")),
          array(
            struct(lit("update_preimage").as("t"), col("__cf_pre").as("r")),
            struct(lit("update_postimage").as("t"), col("__cf_post").as("r"))))
        .otherwise(array().cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("t",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("r", from.schema))))))
        .as("__cf_chg"))
      .select(explode(col("__cf_chg")).as("c"))
      .select(col("c.r.*"), col("c.t").as("_change_type"))
  }
}
