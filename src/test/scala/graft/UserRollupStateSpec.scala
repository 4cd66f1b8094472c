package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.streaming.Streams

/** The transformWithState per-user rollup must equal the batch
  * lifetime aggregate over the same bounded input — whatever the
  * micro-batch split, because the state fold is exact integers and
  * commutative. Also pins valueMicros against Spark's own
  * cast(double as decimal(18,6)). */
class UserRollupStateSpec extends SparkSpec {
  import spark.implicits._

  test("one-shot rollup equals the batch aggregate") {
    val got = Streams.userRollupStateOnce(spark, sf)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getTimestamp(3), r.getLong(4)))
    val events = Tables.events(spark, sf)
    val agg = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total_value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val last = events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts").as("last_ts"),
        col("event_id").as("last_event_id"))
    val want = agg.join(last, Seq("user_id"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getTimestamp(3), r.getLong(4)))
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, e) => assert(g === e) }
  }

  test("valueMicros matches Spark's double->decimal(18,6) cast") {
    val vs = Seq(0.0, 1.5, 12.345678, 0.1 + 0.2, 999.9999995, -3.25,
      123456789.123456)
    val viaSpark = vs.toDF("v")
      .select((col("v").cast(DecimalType(18, 6)) * lit(1000000))
        .cast("long").as("m"))
      .collect().map(_.getLong(0))
    assert(vs.map(Streams.valueMicros) === viaSpark.toSeq)
  }
}
