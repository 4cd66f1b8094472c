package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the `events` table shape (event_id, ts,
  * user_id, event_type, value, props). The reference is batch-only
  * (SURVEY §2.8), so this is the beyond-parity streaming surface the
  * brief asks for: readStream → watermark → windowed aggregation →
  * writeStream, plus custom session state via flatMapGroupsWithState.
  *
  * At scale: the windowed agg is keyed by (window, event_type) — state
  * store partitions by key; the watermark bounds state. Sessionization
  * state is per user_id, partitioned by the groupByKey shuffle, and
  * times out via ProcessingTimeTimeout, so state size tracks the
  * number of ACTIVE users, not history.
  */
object Streams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, total: Double)
  case class Session(user_id: Long, started_at: Timestamp, ended_at: Timestamp,
                     n_events: Int, total_value: Double)

  val SessionGapMs: Long = 30 * 60 * 1000L

  /** File-based streaming source with the events schema (a production
    * deploy would point this at an object-store drop zone or Kafka). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id long, ts timestamp, user_id long, event_type string, value double, props string")
      .parquet(dir)

  /** Watermarked tumbling-window counts per event type: late data past
    * 1 hour is dropped, bounding the state store. */
  def windowedEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Custom session state: emits a Session row whenever a user's gap
    * exceeds 30 minutes (or their state times out, when enabled).
    *
    * `withTimeout=true` closes idle sessions via ProcessingTimeTimeout
    * in a real deployment; tests use the default (no timeout) because
    * the timeout re-arms every micro-batch, which keeps an always-
    * pending batch alive and stalls `processAllAvailable`. */
  def sessionize(events: Dataset[Event], withTimeout: Boolean = false): Dataset[Session] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (withTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeoutConf) {
        case (userId, batch, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= SessionGapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  closed += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (withTimeout) state.setTimeoutDuration(SessionGapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Sink plumbing: append stream to a parquet directory with a
    * checkpoint — the write side of the readStream→writeStream loop. */
  def toParquetSink(df: DataFrame, outDir: String, checkpointDir: String) =
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
}
