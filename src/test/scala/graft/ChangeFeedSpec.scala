package graft

import org.apache.spark.sql.functions._
import graft.operators.{ChangeFeed, Merge}

/** CDF over versioned marts: inserts/deletes/updates classified with
  * pre+post images, unchanged rows absent, and composition with the
  * merge-strategy upsert (the feed of a merge IS the batch's effect).
  */
class ChangeFeedSpec extends SparkSpec {

  test("diff classifies insert, delete, and both update images") {
    import spark.implicits._
    Mat.table(spark, sf, "cdf_spec")(
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("id", "tag", "v"))
    val v1 = Mat.currentVersion(spark, sf, "cdf_spec")
    Mat.refresh(spark, sf, "cdf_spec")(
      Seq((1L, "a", 10L), (2L, "b2", 21L), (4L, "d", 40L)).toDF("id", "tag", "v"))

    val feed = ChangeFeed.changes(spark, sf, "cdf_spec", "id", v1, v1 + 1)
      .orderBy("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSeq
    assert(feed === Seq(
      (2L, "b2", 21L, "update_postimage"), // 'o' < 'r': post sorts first
      (2L, "b", 20L, "update_preimage"),
      (3L, "c", 30L, "delete"),
      (4L, "d", 40L, "insert")))
  }

  test("the feed of a merge upsert is exactly the batch's effect") {
    import spark.implicits._
    Mat.table(spark, sf, "cdf_merge_spec")(
      Seq((1L, "x"), (2L, "y")).toDF("id", "tag"))
    val v1 = Mat.currentVersion(spark, sf, "cdf_merge_spec")
    Merge.upsert(spark, sf, "cdf_merge_spec", "id",
      Seq((2L, "y2"), (3L, "z")).toDF("id", "tag"))
    val feed = ChangeFeed.changes(spark, sf, "cdf_merge_spec", "id", v1, v1 + 1)
    // no deletes (merge never removes), one insert, one update pair
    assert(feed.filter(col("_change_type") === "delete").count() === 0)
    assert(feed.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().toSeq === Seq(3L))
    assert(feed.filter(col("_change_type").startsWith("update")).count() === 2)
  }

  test("identical versions produce an empty feed; bad ranges fail fast") {
    import spark.implicits._
    Mat.table(spark, sf, "cdf_same_spec")(Seq((1L, "a")).toDF("id", "tag"))
    val v1 = Mat.currentVersion(spark, sf, "cdf_same_spec")
    Mat.refresh(spark, sf, "cdf_same_spec")(Seq((1L, "a")).toDF("id", "tag"))
    assert(ChangeFeed.changes(spark, sf, "cdf_same_spec", "id", v1, v1 + 1).count() === 0)
    assertThrows[IllegalArgumentException](
      ChangeFeed.changes(spark, sf, "cdf_same_spec", "id", v1 + 1, v1))
  }
}
