package graft

import java.sql.Date
import org.apache.spark.sql.DataFrame
import graft.marts.TimeMarts

/** Mann-Kendall / runs test / ACF: hand-computed fixtures and the
  * estimators' defining invariants. */
class TrendTestsSpec extends SparkSpec {
  import spark.implicits._

  private def series(cents: Seq[Long]): DataFrame =
    cents.zipWithIndex.map { case (c, i) =>
      (Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        BigDecimal(c) / 100)
    }.toDF("order_date", "daily_revenue")

  test("mann-kendall: strictly increasing series maxes S and flags up") {
    val n = 20
    val r = TimeMarts.mannKendall(series((1 to n).map(_ * 100L)))
      .select("n_days", "s_stat", "var18", "z", "trend_up_05")
      .as[(Long, Long, Long, Double, Boolean)].head()
    assert(r._1 === n)
    assert(r._2 === n.toLong * (n - 1) / 2) // every pair ascends
    assert(r._3 === n.toLong * (n - 1) * (2 * n + 5)) // no ties
    assert(r._5 === true)
  }

  test("mann-kendall: ties reduce the variance by the correction term") {
    // 6 days, values 1,1,2,2,2,3 -> tie groups t=2 and t=3
    val r = TimeMarts.mannKendall(series(Seq(100L, 100L, 200L, 200L, 200L, 300L)))
      .select("var18", "s_stat").as[(Long, Long)].head()
    val n = 6L
    val tie = 2L * 1 * 9 + 3L * 2 * 11
    assert(r._1 === n * (n - 1) * (2 * n + 5) - tie)
    assert(r._2 === 11L) // hand count of ascending minus descending pairs
  }

  test("runs test: perfectly alternating series is anything but random") {
    val cents = (1 to 30).map(i => if (i % 2 == 0) 200L else 100L)
    // median pick is the lower median = 100 -> those days drop as ties;
    // use 3 levels so both sides survive: low 100, high 300, median 200
    val mixed = (1 to 30).map(i => if (i % 2 == 0) 300L else 100L) :+ 200L
    val r = TimeMarts.revenueRunsTest(series(mixed))
      .select("n_above", "n_below", "runs", "random_05")
      .as[(Long, Long, Long, Boolean)].head()
    assert(r._1 === 15L && r._2 === 15L)
    assert(r._3 === 30L) // alternation = a new run every day
    assert(r._4 === false)
    assert(cents.nonEmpty)
  }

  test("runs test: single block each side gives exactly 2 runs") {
    val r = TimeMarts.revenueRunsTest(
      series(Seq.fill(10)(100L) ++ Seq(200L) ++ Seq.fill(10)(300L)))
      .select("runs", "random_05").as[(Long, Boolean)].head()
    assert(r._1 === 2L)
    assert(r._2 === false)
  }

  test("acf: a strict weekly cycle has lag-7 autocorr 1 and lag-1 below it") {
    val week = Seq(100L, 200L, 300L, 400L, 500L, 600L, 700L)
    val cents = Seq.fill(8)(week).flatten
    val rows = TimeMarts.revenueAutocorr(series(cents))
      .select("lag", "autocorr").as[(Int, Double)].collect().toMap
    assert(math.abs(rows(7) - 1.0) < 1e-12)
    assert(rows(1) < rows(7))
    assert(math.abs(rows(28) - rows(7)) < 1e-12)
  }

  test("acf: gated data autocorrs are within [-1, 1]") {
    val rows = TimeMarts.revenueAutocorr(
      Models.dailySummary(spark, sf))
      .select("lag", "autocorr").as[(Int, Double)].collect()
    assert(rows.length === TimeMarts.AutocorrLags.length)
    rows.foreach { case (_, r) => assert(r >= -1.0 && r <= 1.0) }
  }
}
