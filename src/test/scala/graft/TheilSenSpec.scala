package graft

import org.apache.spark.sql.DataFrame
import graft.marts.TimeMarts

/** TimeMarts.revenueTheilSen: exact recovery of a clean linear trend,
  * ROBUSTNESS to a gross outlier (the estimator's reason to exist —
  * OLS would move), and the lower-median element-pick contract. */
class TheilSenSpec extends SparkSpec {
  import spark.implicits._

  private def series(cents: Seq[Long]): DataFrame =
    cents.zipWithIndex.map { case (c, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        BigDecimal(c) / 100)
    }.toDF("order_date", "daily_revenue")

  test("clean line: slope and intercept recovered exactly") {
    // c = 40000 + 5·d cents (d = days since epoch)
    val d0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay
    val cents = (0 until 10).map(i => 40000L + 5L * (d0 + i))
    val r = TimeMarts.revenueTheilSen(series(cents)).collect().head
    assert(r.getAs[Long]("n_days") === 10L)
    assert(r.getAs[Long]("n_pairs") === 45L)
    assert(r.getAs[Double]("slope_cents_per_day") === 5.0)
    assert(r.getAs[Double]("intercept_cents") === 40000.0)
  }

  test("one gross outlier day leaves slope and intercept untouched") {
    val d0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay
    val cents = (0 until 10).map(i => 40000L + 5L * (d0 + i)) :+ 100000000L
    val r = TimeMarts.revenueTheilSen(series(cents)).collect().head
    // 10 of 55 pair slopes touch the outlier — the median never sees
    // them; every clean residual equals the true intercept
    assert(r.getAs[Double]("slope_cents_per_day") === 5.0)
    assert(r.getAs[Double]("intercept_cents") === 40000.0)
  }

  test("lower-median picks element (N+1) div 2 of the slope order") {
    // three days, slopes between consecutive+skip pairs: 1, 3, 2
    // (cents/day) → sorted (1,2,3), N=3 → median = 2nd smallest = 2
    val d0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay
    val base = 10000L - 0L * d0
    val cents = Seq(base, base + 1, base + 4) // slopes: 1, 3 (d2-d1), 2 (d2-d0)
    val r = TimeMarts.revenueTheilSen(series(cents)).collect().head
    assert(r.getAs[Long]("n_pairs") === 3L)
    assert(r.getAs[Double]("slope_cents_per_day") === 2.0)
  }

  test("STL: planted line + weekly wave; operator equals the driver replication") {
    // c = 40000 + 5·d + wave(d % 7), wave mean-0 over 4 full weeks.
    // The fitted line needn't be exactly (5, 40000) under the wave —
    // the test replicates the DEFINITION driver-side from whatever
    // line the operator fits: trend = slope·d + intercept, seasonal =
    // centered dow means of the detrended series, remainder = rest.
    val d0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay
    val wave = Seq(700L, -700L, 1400L, -1400L, 2100L, -2100L, 0L)
    val cents = (0 until 28).map { i =>
      val d = d0 + i
      40000L + 5L * d + wave(((d % 7).toInt + 7) % 7)
    }
    val line = TimeMarts.revenueTheilSen(series(cents)).collect().head
    val (slope, icept) = (line.getAs[Double]("slope_cents_per_day"),
      line.getAs[Double]("intercept_cents"))
    val days = (0 until 28).map(i => d0 + i)
    val det = days.zip(cents).map { case (d, c) => d -> (c - (slope * d + icept)) }
    val seasRaw = det.groupBy(_._1 % 7).view
      .mapValues(v => v.map(_._2).sum / v.length).toMap
    val adj = seasRaw.values.sum / seasRaw.size
    val rows = TimeMarts.revenueStl(series(cents),
        TimeMarts.revenueTheilSen(series(cents)))
      .select("order_date", "cents", "trend", "seasonal", "remainder",
        "seasonal_strength", "trend_strength")
      .collect()
    assert(rows.length === 28)
    rows.foreach { r =>
      val d = r.getAs[java.sql.Date]("order_date").toLocalDate.toEpochDay
      val expTrend = slope * d + icept
      val expSeason = seasRaw(d % 7) - adj
      assert(math.abs(r.getAs[Double]("trend") - expTrend) < 1e-6)
      assert(math.abs(r.getAs[Double]("seasonal") - expSeason) < 1e-6,
        s"day $d seasonal ${r.getAs[Double]("seasonal")} vs $expSeason")
      val expRem = (r.getAs[Long]("cents") - expTrend) - expSeason
      assert(math.abs(r.getAs[Double]("remainder") - expRem) < 1e-6)
      // the wave dominates the remainder: seasonal strength near 1
      assert(r.getAs[Double]("seasonal_strength") > 0.95)
      assert(r.getAs[Double]("trend_strength") > 0.5)
    }
  }

  test("STL: pure trend, no weekly structure -> seasonal ~0, strength collapses") {
    val d0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay
    val cents = (0 until 28).map(i => 40000L + 5L * (d0 + i))
    val rows = TimeMarts.revenueStl(series(cents),
        TimeMarts.revenueTheilSen(series(cents)))
      .select("seasonal", "remainder", "trend_strength").collect()
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("seasonal")) < 1e-6)
      assert(math.abs(r.getAs[Double]("remainder")) < 1e-6)
    }
  }
}
