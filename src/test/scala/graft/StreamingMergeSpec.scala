package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming upsert: micro-batches applied through Merge.upsert keep
  * the mart a complete keyed snapshot, intra-batch duplicates reduce
  * to the last event per key, every applied batch is a version, and
  * the change feed between versions is the batch's net effect.
  */
class StreamingMergeSpec extends SparkSpec {

  test("file-stream micro-batches merge into a versioned keyed snapshot") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("ms-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ms-ckpt").toString

    // batch 1: two keys; batch 2: update 2, insert 3 with an
    // intra-batch duplicate (ts 2 then 3 — the later must win)
    Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ts")
      .coalesce(1).write.parquet(s"$in/f1")
    Seq((2L, "b2", 2L), (3L, "c", 2L), (3L, "c3", 3L)).toDF("id", "v", "ts")
      .coalesce(1).write.parquet(s"$in/f2")
    // file source orders by modification time: force f1 before f2
    def touch(dir: String, t: Long): Unit = {
      val d = new java.io.File(dir)
      (d +: Option(d.listFiles()).getOrElse(Array.empty).toSeq)
        .foreach(f => f.setLastModified(t): Unit)
    }
    val base = System.currentTimeMillis() - 60000
    touch(s"$in/f1", base); touch(s"$in/f2", base + 10000)

    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType), StructField("ts", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$in/f*")
    val stream0 = graft.streaming.Streams
      .mergeSink(stream, sf, "stream_merge_spec", "id", "ts", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    assert(stream0.awaitTermination(120000), "stream did not finish in 120s")

    val rows = spark.table(s"${Mat.schemaFor(sf)}.stream_merge_spec")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows === Seq((1L, "a", 1L), (2L, "b2", 2L), (3L, "c3", 3L)))

    // two applied batches = two versions; the feed between them is the
    // second batch's net effect
    val cur = Mat.currentVersion(spark, sf, "stream_merge_spec")
    assert(cur === 2)
    val feed = graft.operators.ChangeFeed
      .changes(spark, sf, "stream_merge_spec", "id", cur - 1, cur)
    assert(feed.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().toSeq === Seq(3L))
    assert(feed.filter(col("_change_type") === "update_postimage")
      .select("v").as[String].collect().toSeq === Seq("b2"))
    assert(feed.filter(col("_change_type") === "delete").count() === 0)
  }
}
