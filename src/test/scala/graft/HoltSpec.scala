package graft

import java.sql.Date
import org.apache.spark.sql.DataFrame
import graft.marts.TimeMarts

/** TimeMarts.revenueHolt: the array-fold recursion equals the
  * driver-side reference (negative trend included — the truncating-
  * division alignment case), a trend series forecasts ahead where a
  * level-only EWMA lags, and a step spike flags. */
class HoltSpec extends SparkSpec {
  import spark.implicits._

  private def series(cents: Seq[Long]): DataFrame =
    cents.zipWithIndex.map { case (c, i) =>
      (Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        BigDecimal(c) / 100)
    }.toDF("order_date", "daily_revenue")

  /** Textbook recursion, driver-side, same truncating int64 ops. */
  private def reference(cents: Seq[Long]): Seq[(Long, Long)] = {
    var l = cents.head
    var b = cents(1) - cents.head
    (l, b) +: cents.tail.map { x =>
      val nl = (x + 3 * (l + b)) / TimeMarts.HoltDiv
      val nb = ((nl - l) + 3 * b) / TimeMarts.HoltDiv
      l = nl; b = nb
      (l, b)
    }
  }

  test("fold equals the recursion on a FALLING series (negative trend)") {
    // steep fall drives trend (and div operands) negative — the case
    // where floor and truncation part ways
    val cents = Seq(100000L, 80000L, 61000L, 40000L, 22000L, 9000L,
      5000L, 4000L, 3000L, 2500L)
    val got = TimeMarts.revenueHolt(series(cents))
      .orderBy("order_date")
      .select("level", "trend").as[(Long, Long)].collect().toSeq
    val ref = reference(cents)
    assert(ref.exists(_._2 < 0), "fixture must exercise a negative trend")
    assert(got === ref)
  }

  test("sub-2-day series yields ZERO rows, even under ANSI mode (r15 advisory)") {
    // The trend seed b_1 = x_2 − x_1 needs two observations. Pre-fix,
    // a single-day series read element_at(a, 2) unconditionally:
    // null trend non-ANSI, ArrayIndexOutOfBounds under ANSI, and the
    // DuckDB mirror's seed join returned zero rows — engines disagreed.
    // Contract now: BOTH engines emit zero rows below n = 2.
    assert(TimeMarts.revenueHolt(series(Seq(12345L))).count() === 0L)
    assert(TimeMarts.revenueHolt(series(Seq.empty)).count() === 0L)
    val prev = spark.conf.getOption("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try assert(TimeMarts.revenueHolt(series(Seq(12345L))).count() === 0L)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.ansi.enabled", v)
      case None    => spark.conf.unset("spark.sql.ansi.enabled")
    }
    // n = 2 is the smallest live series: exactly two state rows
    assert(TimeMarts.revenueHolt(series(Seq(10000L, 12000L))).count() === 2L)
  }

  test("forecast is the previous state's level+trend") {
    val cents = Seq(10000L, 12000L, 13000L, 15000L, 14000L)
    val rows = TimeMarts.revenueHolt(series(cents))
      .orderBy("order_date")
      .select("level", "trend", "forecast")
      .as[(Long, Long, Option[Long])].collect()
    assert(rows.head._3.isEmpty)
    rows.sliding(2).foreach { case Array((l, b, _), (_, _, f)) =>
      assert(f.contains(l + b))
    }
  }

  test("a steady growth series keeps relative forecast error small") {
    val cents = (1 to 40).map(i => 100000L + 5000L * i)
    val maxDev = TimeMarts.revenueHolt(series(cents))
      .where($"rel_dev".isNotNull)
      .agg(org.apache.spark.sql.functions.max($"rel_dev"))
      .as[Double].head()
    // the trend term absorbs linear growth: error well under the
    // spike threshold everywhere after warmup
    assert(maxDev < TimeMarts.HoltRelDev,
      s"growth series should not spike, max rel_dev $maxDev")
  }

  test("a step change flags a spike on the step day") {
    val cents = Seq.fill(20)(10000L) ++ Seq(40000L) ++ Seq.fill(5)(10000L)
    val spikes = TimeMarts.revenueHolt(series(cents))
      .where($"is_spike" === true)
      .select("cents").as[Long].collect()
    assert(spikes.contains(40000L))
  }
}
