package graft

import org.apache.spark.sql.functions._

/** Schema evolution on the ingest path: a long-lived raw directory
  * accumulates batches whose schema GROWS (new nullable columns). The
  * production read recipe is `mergeSchema` (union of all footer
  * schemas — old files yield nulls for new columns) + an explicit
  * projection with declared defaults, so downstream models see ONE
  * stable contract regardless of which batch a row came from. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema unifies grown batches; defaults restore the contract") {
    val dir = java.nio.file.Files.createTempDirectory("graft-evo").toString
    // batch 1: original schema
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      .write.parquet(s"$dir/batch=1")
    // batch 2: a column was added upstream
    Seq((3L, "c", 7L), (4L, "d", 9L)).toDF("id", "tag", "score")
      .write.parquet(s"$dir/batch=2")

    // default read resolves ONE footer — batch-dependent, not a contract
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "tag", "score", "batch"))

    // the contract projection: new column defaulted for pre-evolution rows
    val contract = merged.select(
      col("id"), col("tag"),
      coalesce(col("score"), lit(0L)).as("score"))
    val rows = contract.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows === Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 7L), (4L, "d", 9L)))

    // old batches still readable standalone with their own schema
    assert(spark.read.parquet(s"$dir/batch=1").columns.toSet === Set("id", "tag"))
  }
}
