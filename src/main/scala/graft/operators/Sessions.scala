package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Batch sessionization of the `events` stream table: a session breaks
  * when a user is idle > 30 minutes. Keyed windows (partition by
  * user_id) — no global sort, scales with user parallelism. The
  * streaming twin (same semantics, incremental state) is
  * graft.streaming.Streams.sessionize.
  *
  * Determinism: window ordered by (ts, event_id); the gap test compares
  * timestamps directly (no epoch conversion — sub-second semantics
  * differ between engines); per-session value totals sum exact decimals
  * (a double at scale 6 never sits on a decimal midpoint, so the cast
  * rounds identically on both engines).
  */
object Sessions {

  def sessionize(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(w)
    val isNew = when(prevTs.isNull ||
      col("ts") > prevTs + expr("interval 30 minutes"), 1).otherwise(0)
    events
      .withColumn("is_new", isNew)
      .withColumn("session_seq",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("started_at"),
        max(col("ts")).as("ended_at"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total_value"))
  }

  val oracleSql: String =
    """with ev as (
      |  select user_id, event_id, ts, cast(value as decimal(18,6)) as v,
      |    case when lag(ts) over (partition by user_id order by ts, event_id) is null
      |           or ts > lag(ts) over (partition by user_id order by ts, event_id) + interval 30 minute
      |         then 1 else 0 end as is_new
      |  from events
      |),
      |ev2 as (
      |  select *, cast(sum(is_new) over (
      |    partition by user_id order by ts, event_id
      |    rows between unbounded preceding and current row) as bigint) as session_seq
      |  from ev
      |)
      |select user_id, session_seq, count(*) as n_events,
      |  min(ts) as started_at, max(ts) as ended_at,
      |  cast(sum(v) as double) as total_value
      |from ev2 group by 1, 2""".stripMargin
}
