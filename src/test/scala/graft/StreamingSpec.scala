package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams
import graft.streaming.Streams.Event

/** Structured Streaming specs: windowed watermarked aggregation and
  * stateful sessionization driven through MemoryStream micro-batches.
  */
class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming: watermarked daily window counts per event type") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = Streams.windowedEventCounts(input.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts("2001-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2001-01-01 11:00:00"), 1, "click", 2.0),
        Event(3, ts("2001-01-01 12:00:00"), 2, "view", 5.0))
      q.processAllAvailable()
      // advance watermark past day 1 so the window closes and emits
      input.addData(Event(4, ts("2001-01-03 00:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
      val clicks = rows.find(_.getAs[String]("event_type") == "click").get
      assert(clicks.getAs[Long]("n_events") === 2)
      assert(clicks.getAs[Double]("total_value") === 3.0)
      val views = rows.find(_.getAs[String]("event_type") == "view").get
      assert(views.getAs[Long]("n_events") === 1)
    } finally q.stop()
  }

  test("streaming: flatMapGroupsWithState closes sessions on 30-minute gaps") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = Streams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // session 1: two events 10 min apart; then a 2-hour gap opens session 2
      input.addData(
        Event(1, ts("2001-01-01 10:00:00"), 7, "click", 1.0),
        Event(2, ts("2001-01-01 10:10:00"), 7, "click", 2.0))
      q.processAllAvailable()
      input.addData(Event(3, ts("2001-01-01 12:30:00"), 7, "click", 4.0))
      q.processAllAvailable()
      val closed = spark.table("sessions").collect()
      assert(closed.length === 1)
      assert(closed(0).getAs[Long]("user_id") === 7)
      assert(closed(0).getAs[Long]("n_events") === 2L)
      assert(closed(0).getAs[Double]("total_value") === 3.0)
      assert(closed(0).getAs[Timestamp]("ended_at") === ts("2001-01-01 10:10:00"))
    } finally q.stop()
  }

  test("streaming: parquet sink round-trip via file source") {
    val dir = java.nio.file.Files.createTempDirectory("stream").toFile.getAbsolutePath
    // seed the source directory with a parquet slice of the events table
    Tables.events(spark, sf).limit(100).write.mode("overwrite").parquet(s"$dir/in")
    val q = Streams.toParquetSink(
      Streams.eventsStream(spark, s"$dir/in")
        .select("event_id", "ts", "event_type", "value"),
      s"$dir/out", s"$dir/ckpt").start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(s"$dir/out").count() === 100)
    } finally q.stop()
  }

  test("streaming one-shot over events table equals its batch twin") {
    val streamed = Models.streamWindowedCounts(spark, sf)
    val batch = Streams.windowedEventCounts(Tables.events(spark, sf))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("events ts contract: batch AND stream readers adapt to every shipped ts shape") {
    // The driver's testdata generator has shipped events.ts as
    // TIMESTAMP(NANOS)-as-long (r1–r8) and as tz-less timestamp[us]
    // (r9) — and r9's streams hard-coded the long shape, silently
    // collapsing every timestamp ~1000× (9 red oracles). This test
    // replaced a canary that CANCELED on the type flip; it now
    // synthesizes every shape and asserts both reader seams
    // (Tables.events, Streams.adaptiveEventsStream) normalize each to
    // the same TimestampType instants — truncating sub-µs nanos, the
    // DuckDB contract — so the next type flip fails the suite loudly.
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("tscontract").toFile.getAbsolutePath
    val micros = Seq(1000000L, 2500000L, 3000000L)
    def baseDf = micros.zipWithIndex.map { case (m, i) =>
      (i.toLong, m, i.toLong, "click", 1.0, "{}")
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val shapes = Map(
      // nanos-as-long with a sub-µs tail that must TRUNCATE, not round
      "long" -> baseDf.withColumn("ts", expr("us * 1000 + 500")),
      // tz-less timestamp[us] → arrives as TimestampNTZ
      "ntz" -> baseDf.withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz")),
      // tz-adjusted timestamp → arrives as TimestampType
      "ltz" -> baseDf.withColumn("ts", timestamp_micros(col("us"))))
    shapes.foreach { case (name, df) =>
      df.select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$base/$name/events.parquet")
    }
    shapes.keys.foreach { name =>
      val batchGot = Tables.events(spark, s"$base/$name")
        .select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq
      assert(batchGot === micros, s"batch reader mishandled ts shape '$name'")
      val q = Streams.adaptiveEventsStream(
          spark, s"$base/$name/events.parquet", globFilter = None)
        .select(unix_micros(col("ts")).as("us"))
        .writeStream.format("memory").queryName(s"tscontract_$name")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val streamGot = spark.table(s"tscontract_$name")
        .select("us").as[Long].collect().sorted.toSeq
      assert(streamGot === micros, s"stream reader mishandled ts shape '$name'")
    }
  }

  test("batch sessionize: sequential sessions reconstruct per-user event counts") {
    val s = Models.sessionize(spark, sf)
    val total = s.agg(sum("n_events")).head.getLong(0)
    assert(total === Tables.events(spark, sf).count())
    assert(s.filter(col("started_at") > col("ended_at")).count() === 0)
    // session_seq forms 1..N per user
    val bad = s.groupBy("user_id")
      .agg(min("session_seq").as("mn"), max("session_seq").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n")).count()
    assert(bad === 0)
  }

  test("streaming quality scorer equals the batch scorer; re-run is idempotent") {
    val weights = Models.qualityWeights(spark, sf)
    val got = Streams.qualityScoreStreamOnce(spark, sf, weights)
    val want = graft.llm.QualityModel.score(
      Tables.documents(spark, sf).filter(col("doc_id") % 5 === 0), weights)
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
    // same session, same checkpoint: replays nothing, returns the same sink
    val again = Streams.qualityScoreStreamOnce(spark, sf, weights)
    assert(again.exceptAll(got).count() === 0 && got.exceptAll(again).count() === 0)
  }
}
