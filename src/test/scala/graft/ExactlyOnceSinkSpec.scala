package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Streams

/** The foreachBatch exactly-once sink must (a) deliver every input
  * row exactly once across a run, and (b) stay duplicate-free when a
  * batch is replayed (simulated by re-running with a WIPED checkpoint
  * over the same input — same batch ids, same data, overwritten
  * directories).
  */
class ExactlyOnceSinkSpec extends SparkSpec {

  test("rows survive exactly once, including across a replay") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-eos").toString
    val out = s"$tmp/out"
    val ckpt = s"$tmp/ckpt"
    val src = Streams.adaptiveEventsStream(spark, sf)
      .select("event_id", "user_id", "event_type")
    def runOnce(): Unit = {
      val q = Streams.exactlyOnceParquetSink(src, out, ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    val expected = Tables.events(spark, sf).count()
    val firstRun = spark.read.parquet(out)
    assert(firstRun.count() === expected)
    assert(firstRun.select("event_id").distinct().count() === expected)

    // replay: wipe the checkpoint so the same input re-delivers under
    // the same batch ids — the sink must overwrite, not append
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    runOnce()
    val replayed = spark.read.parquet(out)
    assert(replayed.count() === expected, "replay duplicated rows")
    assert(replayed.select("event_id").distinct().count() === expected)
  }
}
