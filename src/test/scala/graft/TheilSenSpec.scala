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
}
