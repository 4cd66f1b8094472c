package graft

import org.apache.spark.sql.functions._
import graft.operators.Merge

/** dbt merge-strategy incremental: upsert by unique key through the
  * versioned Mat layout — replaced rows gone, new keys added, untouched
  * rows intact, previous version still readable (time travel).
  */
class MergeSpec extends SparkSpec {

  private val db = Mat.schemaFor(sf)

  test("upsert replaces matched keys, appends new ones, keeps the rest") {
    import spark.implicits._
    Mat.table(spark, sf, "merge_spec")(
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("id", "tag", "v"))
    val v1 = Mat.currentVersion(spark, sf, "merge_spec")

    val merged = Merge.upsert(spark, sf, "merge_spec", "id",
      Seq((2L, "b2", 21L), (4L, "d", 40L)).toDF("id", "tag", "v"))

    val rows = merged.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows === Seq((1L, "a", 10L), (2L, "b2", 21L), (3L, "c", 30L), (4L, "d", 40L)))
    // the stable view serves the merged version
    assert(spark.table(s"$db.merge_spec").count() === 4)
    // time travel: the pre-merge version is intact
    assert(Mat.tableVersion(spark, sf, "merge_spec", v1).count() === 3)
    assert(Mat.tableVersion(spark, sf, "merge_spec", v1)
      .filter(col("tag") === "b").count() === 1)
  }

  test("deleteKeys publishes a version without the keys; CDF shows the deletes") {
    import spark.implicits._
    Mat.table(spark, sf, "delete_spec")(
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "tag"))
    val v1 = Mat.currentVersion(spark, sf, "delete_spec")

    val after = Merge.deleteKeys(spark, sf, "delete_spec", "id",
      Seq(Some(2L), Some(4L), None).toDF("id")) // null key must be a no-op

    assert(after.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    // in-flight snapshot semantics: the pre-delete version still has them
    assert(Mat.tableVersion(spark, sf, "delete_spec", v1).count() === 4)
    // the change feed between the versions is exactly the two deletes
    val feed = graft.operators.ChangeFeed.changes(spark, sf, "delete_spec",
      "id", v1, v1 + 1)
    val deletes = feed.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq
    assert(deletes === Seq(2L, 4L))
    assert(feed.filter(col("_change_type") =!= "delete").count() === 0)
  }

  test("merge into an unbuilt mart and schema drift both fail fast") {
    import spark.implicits._
    assertThrows[IllegalArgumentException](
      Merge.upsert(spark, sf, "merge_spec_missing", "id",
        Seq((1L, "a")).toDF("id", "tag")))
    assertThrows[IllegalArgumentException](
      Merge.upsert(spark, sf, "merge_spec", "id",
        Seq((1L, "a")).toDF("id", "tag"))) // missing the v column
  }
}
