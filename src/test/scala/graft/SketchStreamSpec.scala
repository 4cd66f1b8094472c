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

  private def stageDocs(ingest: Path, fileName: String, mtime: Long,
                        rows: Seq[(Long, String)]): Unit = {
    val tmp = Files.createTempDirectory("graft-scmsstage")
    rows.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.createDirectories(ingest)
    val dst = ingest.resolve(fileName)
    Files.copy(part, dst, StandardCopyOption.REPLACE_EXISTING)
    assert(dst.toFile.setLastModified(mtime))
  }

  test("sum-merged per-batch CMS counters equal the directly-built sketch") {
    val dir = Files.createTempDirectory("graft-scmsspec")
    val ingest = dir.resolve("in")
    val scratch = dir.resolve("scratch").toString
    val t0 = System.currentTimeMillis() - 60000
    // "hot" appears across BOTH batches — only the merged counters
    // see its full count
    val b1 = Seq(1L -> ("hot " * 300).trim, 2L -> "cold mild warm")
    val b2 = Seq(3L -> ("hot " * 250).trim, 4L -> "cold breeze")
    stageDocs(ingest, "f1.parquet", t0, b1)
    stageDocs(ingest, "f2.parquet", t0 + 30000, b2)
    val feed = spark.readStream
      .schema("doc_id long, text string, lang string, source string, n_chars long")
      .option("maxFilesPerTrigger", "1")
      .parquet(ingest.toString)
    val allDocs = (b1 ++ b2)
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = streaming.Streams.cmsSketchStream(spark, feed, allDocs,
        scratch, "spec_scms")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val direct = operators.Sketches.cmsHeavyHitters(
        allDocs.select(explode(graft.llm.Dedup.words(col("text"))).as("term")),
        col("term"), "term", operators.Sketches.CmsHeavyThreshold)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == direct)
    // the cross-batch key is reported with its FULL exact count
    assert(got.contains("hot") && got("hot")._1 == 550L)
  }

  test("sum-merged per-batch histogram bins equal the directly-built quantiles") {
    val dir = Files.createTempDirectory("graft-shistspec")
    val ingest = dir.resolve("in")
    val scratch = dir.resolve("scratch").toString
    val t0 = System.currentTimeMillis() - 60000
    val ts0 = Timestamp.valueOf("2024-02-01 09:00:00")
    // the value range is SPLIT across batches — every quantile of the
    // merged histogram depends on both (one batch alone would put the
    // median near 25, not 50)
    def rows(vs: Range, idOff: Long) =
      vs.map(v => (idOff + v, ts0, v.toLong, "click", v.toDouble, "{}"))
    val b1 = rows(1 to 50, 0L)
    val b2 = rows(51 to 100, 1000L)
    def stage(name: String, mtime: Long,
              rs: Seq[(Long, Timestamp, Long, String, Double, String)]): Unit = {
      val tmp = Files.createTempDirectory("graft-shiststage")
      rs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp)
        .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
      Files.createDirectories(ingest)
      val dst = ingest.resolve(name)
      Files.copy(part, dst, StandardCopyOption.REPLACE_EXISTING)
      assert(dst.toFile.setLastModified(mtime))
    }
    stage("f1.parquet", t0, b1)
    stage("f2.parquet", t0 + 30000, b2)
    val feed = spark.readStream
      .schema("event_id long, ts timestamp, user_id long, event_type string, value double, props string")
      .option("maxFilesPerTrigger", "1")
      .parquet(ingest.toString)
    val all = (b1 ++ b2)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getDouble(1)) -> ((r.getLong(2), r.getDouble(3)))
    val pinned = operators.Sketches.histStats(
      all.filter(col("value").isNotNull), Seq("event_type"), col("value"))
    val got = streaming.Streams.histSketchStream(spark, feed, pinned,
      scratch, "spec_shist").collect().map(key).toMap
    val direct = operators.Sketches.histogramQuantiles(
      all, Seq("event_type"), col("value")).collect().map(key).toMap
    assert(got == direct)
    // the merged median really saw both batches
    val (n, p50) = got(("click", 0.5))
    assert(n == 100L)
    assert(p50 > 45.0 && p50 < 55.0, s"median $p50 should be near 50")

    // idempotence: same checkpoint → nothing reprocessed, same result
    val again = streaming.Streams.histSketchStream(spark, feed, pinned,
      scratch, "spec_shist2").collect().map(key).toMap
    assert(again == got)
  }

  test("sum-merged per-batch PSI counters equal the directly-computed drift") {
    val dir = Files.createTempDirectory("graft-spsispec")
    val ingest = dir.resolve("in")
    val scratch = dir.resolve("scratch").toString
    val t0 = System.currentTimeMillis() - 60000
    val jan = Timestamp.valueOf("2024-01-15 12:00:00")
    val jun = Timestamp.valueOf("2024-06-15 12:00:00")
    // ref and cur rows INTERLEAVED across the two batches — only the
    // merged counters see both sides of either month completely
    def rows(vs: Range, t: Timestamp, idOff: Long, shift: Double) =
      vs.map(v => (idOff + v, t, v.toLong, "click", v.toDouble + shift, "{}"))
    val b1 = rows(1 to 25, jan, 0L, 0.0) ++ rows(1 to 25, jun, 2000L, 40.0)
    val b2 = rows(26 to 50, jan, 1000L, 0.0) ++ rows(26 to 50, jun, 3000L, 40.0)
    def stage(name: String, mtime: Long,
              rs: Seq[(Long, Timestamp, Long, String, Double, String)]): Unit = {
      val tmp = Files.createTempDirectory("graft-spsistage")
      rs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp)
        .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
      Files.createDirectories(ingest)
      val dst = ingest.resolve(name)
      Files.copy(part, dst, StandardCopyOption.REPLACE_EXISTING)
      assert(dst.toFile.setLastModified(mtime))
    }
    stage("f1.parquet", t0, b1)
    stage("f2.parquet", t0 + 30000, b2)
    val feed = spark.readStream
      .schema("event_id long, ts timestamp, user_id long, event_type string, value double, props string")
      .option("maxFilesPerTrigger", "1")
      .parquet(ingest.toString)
    val all = (b1 ++ b2)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def row(r: org.apache.spark.sql.Row) =
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    val got = streaming.Streams.psiMonitorStream(spark, feed,
      operators.Stats.psiPinnedStats(all),
      scratch, "spec_spsi").collect().map(row).toMap
    val direct = operators.Stats.featureDriftPsi(all).collect().map(row).toMap
    assert(got == direct)
    // the shifted current month drifts: cur sits half outside the ref
    // range (clamped into the top bin) — PSI must flag
    val (nr, nc, psi, flag) = got("click")
    assert(nr == 50L && nc == 50L)
    assert(psi > 1.0 && flag, s"expected strong drift, got $psi")
  }
}
