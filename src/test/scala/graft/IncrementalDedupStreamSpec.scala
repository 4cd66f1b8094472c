package graft

import java.nio.file.{Files, Path, StandardCopyOption}

/** The CLOSED streaming near-dup loop (VERDICT r10 #2): with the
  * batch's own band rows self-appended to the standing index, two new
  * documents arriving in DIFFERENT micro-batches are still compared —
  * the case the bounded r10 demo documented as a gap. Also pins the
  * exactly-once sink shape (ADVICE r10 #1): both the pairs and the
  * band appends land in `batch=<id>` keyed directories, and a re-run
  * against the same checkpoint processes nothing and returns the
  * identical result. */
class IncrementalDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val nearDupText =
    "the quick brown fox jumps over the lazy dog while seventeen " +
      "startled geese honk across the frozen harbor at dawn every " +
      "single morning without fail in the cold north wind"

  /** Write one single-file parquet delivery into `ingest` with a
    * controlled mtime (the file source orders its listing by
    * modification time — older file must be batch 0). */
  private def stageFile(ingest: Path, fileName: String, mtime: Long,
                        rows: Seq[(Long, String)]): Unit = {
    val tmp = Files.createTempDirectory("graft-sndstage")
    rows.map { case (id, text) => (id, text, "en", "web", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.createDirectories(ingest)
    val dst = ingest.resolve(fileName)
    Files.copy(part, dst, StandardCopyOption.REPLACE_EXISTING)
    assert(dst.toFile.setLastModified(mtime))
  }

  private def emptyBands =
    Seq.empty[(Long, Int, Long)].toDF("doc_id", "band", "v")

  test("a batch-2 doc finds its near-dup from batch 1 through the self-appended index") {
    val dir = Files.createTempDirectory("graft-sndspec")
    val ingest = dir.resolve("in")
    val scratch = dir.resolve("scratch").toString
    val t0 = System.currentTimeMillis() - 60000
    // doc 5 arrives first; its near-dup (identical text → all 8 bands
    // shared) arrives in a LATER file; an unrelated doc rides along
    stageFile(ingest, "f1.parquet", t0, Seq(5L -> nearDupText))
    stageFile(ingest, "f2.parquet", t0 + 30000, Seq(
      10L -> nearDupText,
      15L -> "completely unrelated content about databases and distributed systems with no overlap whatsoever in any shingle window of this text"))
    val newDocs = spark.readStream
      .schema("doc_id long, text string, lang string, source string, n_chars long")
      .option("maxFilesPerTrigger", "1")
      .parquet(ingest.toString)
    val pairs = streaming.Streams.incrementalDedupStream(
      spark, newDocs, scratch, emptyBands, "spec_neardup")
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the cross-batch pair, found with the full band agreement
    assert(got.toSeq == Seq((5L, 10L, graft.llm.Dedup.MinhashPairBands.toLong)),
      s"expected exactly the cross-batch pair (5,10); got ${got.toSeq}")
    // exactly-once shape: one keyed directory per batch, both sinks
    val fs = new org.apache.hadoop.fs.Path(scratch)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def batches(sub: String): Seq[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$scratch/$sub")).toSeq
        .map(_.getPath.getName).filter(_.startsWith("batch=")).sorted
    assert(batches("out") == Seq("batch=0", "batch=1"))
    assert(batches("bands") == Seq("batch=0", "batch=1"))
    // idempotence: a re-run over the same checkpoint processes nothing
    // and serves the identical pair set
    val newDocs2 = spark.readStream
      .schema("doc_id long, text string, lang string, source string, n_chars long")
      .option("maxFilesPerTrigger", "1")
      .parquet(ingest.toString)
    val again = streaming.Streams.incrementalDedupStream(
      spark, newDocs2, scratch, emptyBands, "spec_neardup_rerun")
    assert(again.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((5L, 10L)))
  }

  test("registered multi-batch query: two real batches whose union equals the batch incremental result") {
    // the oracle-gated production path (VERDICT r11 #2): same pair set
    // as the one-shot batch query — cross-batch pairs can only appear
    // via the self-appended index, so set equality IS the loop check
    val got = Models.streamNeardupMultibatch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Models.dedupIncrementalPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"multibatch sink != batch incremental result " +
      s"(only-stream=${(got -- want).take(5)}, only-batch=${(want -- got).take(5)})")
    assert(got.nonEmpty, "the sf0.001 corpus must produce near-dup pairs")
    // and it really ran as TWO micro-batches with real rows
    val acct = streaming.Streams.lastAccounting.get("stream_neardup_multibatch")
    assert(acct != null && acct.contains("\"batches\":2"), s"accounting: $acct")
  }
}
