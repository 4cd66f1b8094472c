package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.marts.TimeMarts

/** TimeMarts.revenueCusum: the closed-form prefix-extrema rewrite
  * equals the textbook recursion, a step change alarms, a flat series
  * never does, and the int64 headroom the Scaladoc promises holds on
  * the gated data. */
class CusumSpec extends SparkSpec {
  import spark.implicits._

  private def series(cents: Seq[Long]): DataFrame =
    cents.zipWithIndex.map { case (c, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        BigDecimal(c) / 100)
    }.toDF("order_date", "daily_revenue")

  /** The textbook recursion, driver-side, in the same n-scaled ints. */
  private def reference(cents: Seq[Long]): Seq[(Long, Long)] = {
    val n = cents.length.toLong
    val s = cents.sum
    val slack = s / TimeMarts.CusumSlackDiv
    var (cp, cn) = (0L, 0L)
    cents.map { x =>
      cp = math.max(0L, cp + (n * x - s - slack))
      cn = math.max(0L, cn - (n * x - s + slack))
      (cp, cn)
    }
  }

  test("closed form equals the recursion on an irregular series") {
    val cents = Seq(10000L, 12000L, 8000L, 25000L, 9000L, 9000L,
      30000L, 5000L, 11000L, 10000L, 40000L, 40000L, 3000L)
    val got = TimeMarts.revenueCusum(series(cents))
      .orderBy("order_date")
      .select("cusum_pos", "cusum_neg").as[(Long, Long)].collect().toSeq
    assert(got === reference(cents))
  }

  test("a step change alarms on both sides of the cut") {
    // 10 days at 100.00 then 5 at 300.00: the elevated run drives C+
    // past 2S within 3 days; the long below-mean prefix drives C-
    val cents = Seq.fill(10)(10000L) ++ Seq.fill(5)(30000L)
    val out = TimeMarts.revenueCusum(series(cents))
      .orderBy("order_date").collect()
    val pos = out.map(_.getAs[Boolean]("alarm_pos"))
    val neg = out.map(_.getAs[Boolean]("alarm_neg"))
    assert(pos.takeWhile(!_).length === 12 && pos.drop(12).forall(identity),
      "alarm_pos fires from the 3rd elevated day on")
    assert(neg.exists(identity) && !neg.last,
      "the below-mean prefix alarms C-, the elevated tail clears it")
  }

  test("a flat series accumulates nothing (slack absorbs zero drift)") {
    val out = TimeMarts.revenueCusum(series(Seq.fill(14)(10000L)))
    assert(out.filter(col("cusum_pos") =!= 0L || col("cusum_neg") =!= 0L ||
      col("alarm_pos") || col("alarm_neg")).count() === 0)
  }

  test("int64 headroom holds on the gated daily series") {
    val daily = Models.dailySummary(spark, sf)
    val n = daily.count()
    val maxCents = daily
      .agg(max((col("daily_revenue") * 100).cast("long"))).as[Long].head()
    // |P_t| <= days^2 * max_cents (coarse bound from the Scaladoc)
    assert(BigInt(n) * BigInt(n) * BigInt(maxCents) < BigInt(Long.MaxValue) / 4,
      s"n=$n maxCents=$maxCents leaves <4x headroom — widen to decimal(38,0)")
  }
}
