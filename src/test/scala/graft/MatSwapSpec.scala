package graft

import java.sql.Date

import org.apache.spark.sql.functions._

/** The versioned-location swap (VERDICT r4 "Next round" #2): a rebuild
  * must be atomic against concurrent readers — a DataFrame resolved
  * BEFORE a refresh still reads its full consistent snapshot after it,
  * while new resolutions see the new version; retained versions give
  * poor-man's time travel; pruned versions actually disappear.
  */
class MatSwapSpec extends SparkSpec {

  private val db = Mat.schemaFor(sf)

  test("reader resolved before refresh keeps its snapshot; new readers see the new version") {
    import spark.implicits._
    Mat.table(spark, sf, "swap_spec")(
      Seq((1L, "v1"), (2L, "v1")).toDF("id", "tag"))
    assert(Mat.currentVersion(spark, sf, "swap_spec") === 1)

    // resolve through the stable name BEFORE the refresh: analysis
    // expands the view, pinning this plan to version 1's relation
    val before = spark.table(s"$db.swap_spec")

    Mat.refresh(spark, sf, "swap_spec")(
      Seq((1L, "v2"), (2L, "v2"), (3L, "v2")).toDF("id", "tag"))

    // the pre-refresh reader still sees version 1, in full
    assert(before.count() === 2)
    assert(before.filter(col("tag") =!= "v1").count() === 0)
    // a new resolution sees version 2
    val after = spark.table(s"$db.swap_spec")
    assert(after.count() === 3)
    assert(after.filter(col("tag") =!= "v2").count() === 0)
    // time travel: the previous version is still addressable by name
    assert(spark.table(s"$db.swap_spec__v1").count() === 2)
  }

  test("versions beyond KeepVersions are dropped and their files deleted") {
    import spark.implicits._
    Mat.table(spark, sf, "swap_prune_spec")(Seq((1L, "a")).toDF("id", "tag"))
    val v1Loc = java.net.URI.create(
      spark.sql(s"DESCRIBE TABLE EXTENDED $db.swap_prune_spec__v1").collect()
        .find(_.getString(0) == "Location").get.getString(1)).getPath
    assert(new java.io.File(v1Loc).exists())
    // a reader pinned to v2 before the pruning refresh
    Mat.refresh(spark, sf, "swap_prune_spec")(Seq((2L, "b")).toDF("id", "tag"))
    val v2Reader = spark.table(s"$db.swap_prune_spec")
    // third version: v1 falls out of the retention window
    Mat.refresh(spark, sf, "swap_prune_spec")(Seq((3L, "c")).toDF("id", "tag"))
    assert(Mat.currentVersion(spark, sf, "swap_prune_spec") === 3)
    assert(!new java.io.File(v1Loc).exists(), "pruned version directory still on disk")
    assert(spark.catalog.tableExists(s"$db.swap_prune_spec__v2"))
    assert(!spark.catalog.tableExists(s"$db.swap_prune_spec__v1"))
    // the in-retention pre-refresh reader still works
    assert(v2Reader.select("tag").head.getString(0) === "b")
    assert(spark.table(s"$db.swap_prune_spec").select("tag").head.getString(0) === "c")
  }

  test("refresh of a month-partitioned mart keeps pruning metadata") {
    import spark.implicits._
    val mk = (d: String, v: Long) => (Date.valueOf(d), v)
    Mat.table(spark, sf, "swap_part_spec", timeKey = Some("d"))(
      Seq(mk("1997-01-05", 1L), mk("1997-02-06", 2L)).toDF("d", "v"))
    Mat.refresh(spark, sf, "swap_part_spec", timeKey = Some("d"))(
      Seq(mk("1997-01-05", 10L), mk("1997-02-06", 20L), mk("1997-03-07", 30L))
        .toDF("d", "v"))
    val cur = spark.table(s"$db.swap_part_spec")
    assert(cur.count() === 3)
    // the refreshed version still carries the time-key property the
    // MonthPruning rule reads (set on the versioned table, reached
    // through the view)
    val props = spark.sql(
      s"SHOW TBLPROPERTIES ${Mat.currentTable(spark, sf, "swap_part_spec")}")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get(plans.MonthPruning.TimeKeyProp).contains("d"))
    // and a time-key range filter still prunes to one month's partition
    val one = cur.filter(col("d") >= lit(Date.valueOf("1997-03-01")) &&
      col("d") <= lit(Date.valueOf("1997-03-31")))
    assert(one.count() === 1)
  }
}
