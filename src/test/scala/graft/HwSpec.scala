package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.DataFrame
import graft.marts.TimeMarts

/** TimeMarts.holtWintersDaily / forecastEval: the triple-smoothing
  * array fold equals the driver-side reference recursion (negative
  * trend included — truncating-division alignment), the sub-2m gate
  * emits zero rows, and the holdout eval prefers HW exactly when a
  * weekly cycle is planted. */
class HwSpec extends SparkSpec {
  import spark.implicits._

  private val M = TimeMarts.HwSeason

  private def daysDf(vals: Seq[Long]): DataFrame =
    vals.zipWithIndex.map { case (v, i) =>
      (Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), v)
    }.toDF("d", "v")

  /** One event row per planted count unit, so eventVolumeHw's daily
    * count reproduces the series exactly. */
  private def eventsDf(counts: Seq[Long]): DataFrame =
    counts.zipWithIndex.flatMap { case (c, i) =>
      (0L until c).map { j =>
        (i.toLong * 1000 + j,
          Timestamp.valueOf(java.time.LocalDateTime
            .of(2024, 1, 1, 12, 0).plusDays(i).plusSeconds(j)))
      }
    }.toDF("event_id", "ts")

  /** Textbook seeded HW recursion, driver-side, truncating int64 ops
    * (Scala Long / truncates toward zero — same as Spark div and
    * DuckDB //). Returns (level, trend, seasonal, forecast) per day
    * m+1..n. */
  private def reference(xs: Seq[Long]): Seq[(Long, Long, Long, Long)] = {
    val sum1 = xs.take(M).sum
    val sum2 = xs.slice(M, 2 * M).sum
    var l = sum1 / M
    var b = (sum2 - sum1) / (M.toLong * M)
    var seas = xs.take(M).map(_ - l).toVector
    xs.drop(M).map { x =>
      val sm = seas.head
      val f = l + b + sm
      val nl = (x - sm + 3 * (l + b)) / TimeMarts.HoltDiv
      val nb = ((nl - l) + 3 * b) / TimeMarts.HoltDiv
      val ns = ((x - nl) + 3 * sm) / TimeMarts.HoltDiv
      seas = seas.tail :+ ns; l = nl; b = nb
      (nl, nb, ns, f)
    }
  }

  test("fold equals the recursion on a FALLING weekly-cycled series") {
    // steep fall drives trend (and div operands) negative — where
    // floor and truncation part ways — on top of a planted dow cycle
    val cycle = Seq(0L, 40L, 80L, 40L, 0L, -40L, -80L)
    val xs = (0 until 21).map(i => 5000L - 220L * i + cycle(i % M))
    val got = TimeMarts.holtWintersDaily(daysDf(xs))
      .orderBy("d")
      .select("level", "trend", "seasonal", "forecast")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val ref = reference(xs)
    assert(ref.exists(_._2 < 0), "fixture must exercise a negative trend")
    assert(got === ref)
  }

  test("sub-2m series yields ZERO rows (seeding needs two seasons)") {
    assert(TimeMarts.holtWintersDaily(daysDf(Seq.fill(2 * M - 1)(100L)))
      .count() === 0L)
    assert(TimeMarts.holtWintersDaily(daysDf(Seq.empty)).count() === 0L)
  }

  test("holdout eval prefers HW on a planted weekly cycle") {
    // 28 days: 21 train + 7 holdout; counts carry a strong dow cycle
    // plus mild noise-free trend — HW must beat Holt on wMAPE, and
    // the n_train/n_test accounting must match the split.
    val cycle = Seq(10L, 30L, 50L, 30L, 10L, 0L, -10L)
    val counts = (0 until 28).map(i => 60L + i + cycle(i % M))
    val revenue = daysDf(counts.map(_ * 100))
      .select(col("d").as("order_date"),
        (col("v") / 100.0).as("daily_revenue"))
    val rows = TimeMarts.forecastEval(revenue, eventsDf(counts))
      .select("series", "model", "n_train", "n_test", "wmape")
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(rows.size === 4)
    val (tn, te, hwW) = rows(("event_volume", "hw"))
    val (_, _, holtW) = rows(("event_volume", "holt"))
    assert((tn, te) === ((21L, 7L)))
    assert(hwW < holtW,
      s"planted weekly cycle: hw wmape $hwW must beat holt $holtW")
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
