package graft

import java.nio.file.{Files, Path, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Streaming incremental view maintenance ([[streaming.Streams.ivmAggStream]]):
  * the maintained aggregate must CHAIN across micro-batches (batch 1
  * reads the state batch 0 wrote, not the base), end up equal to a
  * full recompute over base ∪ every batch, and be idempotent under a
  * same-checkpoint re-run (the exactly-once keyed-sink contract). */
class IvmStreamSpec extends SparkSpec {
  import spark.implicits._

  /** One single-file parquet delivery with a controlled mtime (the
    * file source orders its listing by modification time). */
  private def stageFile(ingest: Path, fileName: String, mtime: Long,
                        rows: Seq[(String, Double)]): Unit = {
    val tmp = Files.createTempDirectory("graft-ivmstage")
    rows.toDF("event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.createDirectories(ingest)
    val dst = ingest.resolve(fileName)
    Files.copy(part, dst, StandardCopyOption.REPLACE_EXISTING)
    assert(dst.toFile.setLastModified(mtime))
  }

  private def feedOf(ingest: Path) =
    spark.readStream
      .schema("event_type string, value double")
      .option("maxFilesPerTrigger", "1")
      .parquet(ingest.toString)
      .select(col("event_type"),
        col("value").cast(DecimalType(18, 6)).as("value"))

  test("maintained aggregate chains across batches and equals a full recompute") {
    val dir = Files.createTempDirectory("graft-ivmspec")
    val ingest = dir.resolve("in")
    val scratch = dir.resolve("scratch").toString
    val t0 = System.currentTimeMillis() - 60000
    // base: click ×2 (3.50), view ×1 (3.25) — built through the same
    // aggregation shape the production base mart uses
    val base = Seq(("click", 1.5), ("click", 2.0), ("view", 3.25))
      .toDF("event_type", "value")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).as("total"))
    stageFile(ingest, "f1.parquet", t0, Seq("click" -> 1.0, "purchase" -> 5.0))
    stageFile(ingest, "f2.parquet", t0 + 30000, Seq("click" -> 0.25, "view" -> 4.0))

    val got = streaming.Streams.ivmAggStream(spark, feedOf(ingest), scratch,
        base, "event_type", "value", "spec_ivm")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2).toPlainString)))
      .toMap
    assert(got == Map(
      "click" -> ((4L, "4.750000")),
      "purchase" -> ((1L, "5.000000")),
      "view" -> ((2L, "7.250000"))))

    // cross-batch chaining: batch 0's committed snapshot must carry f1
    // but NOT f2 (click stopped at 4.50 with no view movement yet)
    val aggDir = java.nio.file.Paths.get(scratch, "agg")
    assert(Files.exists(aggDir.resolve("batch=0").resolve("_SUCCESS")))
    assert(Files.exists(aggDir.resolve("batch=1").resolve("_SUCCESS")))
    val after0 = spark.read.parquet(aggDir.resolve("batch=0").toString)
      .collect().map(r => r.getString(0) -> r.getDecimal(2).toPlainString).toMap
    assert(after0 == Map("click" -> "4.500000", "purchase" -> "5.000000",
      "view" -> "3.250000"))

    // idempotence: a re-run against the same checkpoint processes no
    // batches and serves the identical maintained state
    val again = streaming.Streams.ivmAggStream(spark, feedOf(ingest), scratch,
        base, "event_type", "value", "spec_ivm_rerun")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2).toPlainString)))
      .toMap
    assert(again == got)
  }

  /** A feed carrying `_change_type` applies as a FULL CDC stream:
    * deletes and update pre-images retract, groups maintained to
    * count 0 vanish — the Delta-CDF → materialized-view apply path. */
  test("a _change_type feed applies deletes and update images through the delta rule") {
    val dir = Files.createTempDirectory("graft-ivmcdc")
    val ingest = dir.resolve("in")
    val scratch = dir.resolve("scratch").toString
    val t0 = System.currentTimeMillis() - 60000
    def stageCdc(fileName: String, mtime: Long,
                 rows: Seq[(String, Double, String)]): Unit = {
      val tmp = Files.createTempDirectory("graft-ivmcdcstage")
      rows.toDF("event_type", "value", "_change_type")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.createDirectories(ingest)
      val dst = ingest.resolve(fileName)
      Files.copy(part, dst, StandardCopyOption.REPLACE_EXISTING)
      assert(dst.toFile.setLastModified(mtime))
    }
    // base: click ×2 (3.50), view ×1 (3.25)
    val base = Seq(("click", 1.5), ("click", 2.0), ("view", 3.25))
      .toDF("event_type", "value")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).as("total"))
    // batch 0: one click's value revised 1.50 -> 1.75 (pre+post pair)
    stageCdc("f1.parquet", t0, Seq(
      ("click", 1.5, "update_preimage"), ("click", 1.75, "update_postimage")))
    // batch 1: the whole view group deleted, a purchase inserted
    stageCdc("f2.parquet", t0 + 30000, Seq(
      ("view", 3.25, "delete"), ("purchase", 9.0, "insert")))
    val feed = spark.readStream
      .schema("event_type string, value double, _change_type string")
      .option("maxFilesPerTrigger", "1")
      .parquet(ingest.toString)
      .select(col("event_type"),
        col("value").cast(DecimalType(18, 6)).as("value"),
        col("_change_type"))
    val got = streaming.Streams.ivmAggStream(spark, feed, scratch,
        base, "event_type", "value", "spec_ivm_cdc")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2).toPlainString)))
      .toMap
    assert(got == Map(
      "click" -> ((2L, "3.750000")),    // 1.75 + 2.00 after the revision
      "purchase" -> ((1L, "9.000000"))))
    assert(!got.contains("view"))       // maintained count hit 0 -> dropped
  }
}
