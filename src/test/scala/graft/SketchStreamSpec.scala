package graft

import java.nio.file.{Files, Path, StandardCopyOption}
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Streaming HLL sketch maintenance ([[streaming.Streams.hllSketchStream]]):
  * per-batch register tables merged register-wise must equal the
  * sketch built directly from all rows at once — the mergeability
  * property, exercised across REAL micro-batch boundaries (the same
  * day's users split across two files), plus the exactly-once keyed
  * sink's idempotence under a same-checkpoint re-run. */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  private def stageFile(ingest: Path, fileName: String, mtime: Long,
                        rows: Seq[(Long, Timestamp, Long)]): Unit = {
    val tmp = Files.createTempDirectory("graft-shllstage")
    rows.map { case (id, ts, uid) => (id, ts, uid, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.createDirectories(ingest)
    val dst = ingest.resolve(fileName)
    Files.copy(part, dst, StandardCopyOption.REPLACE_EXISTING)
    assert(dst.toFile.setLastModified(mtime))
  }

  test("merged per-batch registers equal the directly-built sketch") {
    val dir = Files.createTempDirectory("graft-shllspec")
    val ingest = dir.resolve("in")
    val scratch = dir.resolve("scratch").toString
    val t0 = System.currentTimeMillis() - 60000
    def ts(d: Int, h: Int) = Timestamp.valueOf(f"2024-02-0$d $h%02d:00:00")
    // one shared day split across both batches + a batch-2-only day
    val batch1 = (1L to 40L).map(u => (u, ts(1, 9), u))
    val batch2 = (30L to 70L).map(u => (u + 100, ts(1, 15), u)) ++
      (1L to 10L).map(u => (u + 200, ts(2, 9), u))
    stageFile(ingest, "f1.parquet", t0, batch1)
    stageFile(ingest, "f2.parquet", t0 + 30000, batch2)
    val feed = spark.readStream
      .schema("event_id long, ts timestamp, user_id long, event_type string, value double, props string")
      .option("maxFilesPerTrigger", "1")
      .parquet(ingest.toString)
    val got = streaming.Streams.hllSketchStream(spark, feed, scratch, "spec_shll")
      .collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap

    // direct build over the union — the mergeability claim
    val all = (batch1 ++ batch2)
      .map { case (id, t, uid) => (id, t, uid, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val direct = operators.Sketches.hllEstimateByGroup(
        all.withColumn("day", to_date(col("ts"))), Seq("day"),
        concat(lit("hll|"), col("user_id").cast("string")))
      .collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    assert(got == direct)
    assert(got.keySet == Set("2024-02-01", "2024-02-02"))
    // estimates are in the right ballpark (70 and 10 true uniques)
    assert(math.abs(got("2024-02-01") - 70.0) < 25.0)
    assert(math.abs(got("2024-02-02") - 10.0) < 5.0)

    // idempotence: same checkpoint → nothing reprocessed, same result
    val again = streaming.Streams.hllSketchStream(spark, feed, scratch, "spec_shll2")
      .collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    assert(again == got)
  }
}
