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
    // ... and through the typed API, which validates the retention window
    assert(Mat.tableVersion(spark, sf, "swap_spec", 1).count() === 2)
    assert(Mat.tableVersion(spark, sf, "swap_spec", 2).count() === 3)
    assertThrows[IllegalArgumentException](
      Mat.tableVersion(spark, sf, "swap_spec", 3))
  }

  test("published versions carry catalog row-count statistics") {
    import spark.implicits._
    Mat.table(spark, sf, "stats_spec")(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "tag"))
    val n = Mat.currentVersion(spark, sf, "stats_spec")
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(s"stats_spec__v$n",
        Some(db)))
    assert(meta.stats.flatMap(_.rowCount).contains(BigInt(3)),
      s"no rowCount in ${meta.stats}")
    assert(meta.stats.exists(_.sizeInBytes > 0))
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
    // tableVersion refuses the pruned version instead of failing later
    // (or silently reading another version)
    assertThrows[IllegalArgumentException](
      Mat.tableVersion(spark, sf, "swap_prune_spec", 1))
    assert(Mat.tableVersion(spark, sf, "swap_prune_spec", 2)
      .select("tag").head.getString(0) === "b")
  }

  test("a failed build releases its slot; the next refresh publishes cleanly") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val contract = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tag", StringType, nullable = true)))
    Mat.table(spark, sf, "swap_fail_spec", contract = Some(contract))(
      Seq((Some(1L), "v1")).toDF("id", "tag"))
    assert(Mat.currentVersion(spark, sf, "swap_fail_spec") === 1)
    // a data-contract violation fails INSIDE the write job, after the
    // version slot was reserved — rollback must release it
    intercept[Exception] {
      Mat.refresh(spark, sf, "swap_fail_spec", contract = Some(contract))(
        Seq((Some(2L), "bad"), (None, "bad")).toDF("id", "tag"))
    }
    assert(Mat.currentVersion(spark, sf, "swap_fail_spec") === 1,
      "failed refresh leaked its version slot")
    // the live version is untouched and the next refresh lands on slot 2
    assert(spark.table(s"$db.swap_fail_spec").select("tag").head.getString(0) === "v1")
    Mat.refresh(spark, sf, "swap_fail_spec", contract = Some(contract))(
      Seq((Some(3L), "v2")).toDF("id", "tag"))
    assert(Mat.currentVersion(spark, sf, "swap_fail_spec") === 2)
    assert(spark.table(s"$db.swap_fail_spec").select("tag").head.getString(0) === "v2")
  }

  test("concurrent refreshes serialize per mart; the view always lands on a complete version") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = Mat.ec
    Mat.table(spark, sf, "swap_race_spec")(Seq((0L, "seed")).toDF("id", "tag"))
    // 4 concurrent rebuilds of the SAME mart: without per-key
    // serialization these interleave slot reservation / publication /
    // retention pruning and can overwrite a live directory (ADVICE r5)
    val tags = (1 to 4).map(i => s"r$i")
    Await.result(Future.sequence(tags.map(t => Future {
      Mat.refresh(spark, sf, "swap_race_spec")(
        Seq((1L, t), (2L, t)).toDF("id", "tag")): Unit
    })), Duration.Inf)
    // one slot per refresh, none reused, none skipped
    assert(Mat.currentVersion(spark, sf, "swap_race_spec") === 5)
    // the stable view points at SOME complete refresh (2 rows, one tag)
    val rows = spark.table(s"$db.swap_race_spec").collect()
    assert(rows.length === 2)
    assert(rows.map(_.getString(1)).distinct.toSeq.length === 1)
    assert(tags.contains(rows.head.getString(1)))
    // retained versions are intact snapshots too
    (4 to 5).foreach { v =>
      val snap = spark.table(s"$db.swap_race_spec__v$v").collect()
      assert(snap.length === 2 && snap.map(_.getString(1)).distinct.length === 1)
    }
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
