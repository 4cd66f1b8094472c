package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

/** Exact-moment Pearson ([[operators.Stats.corrMatrix]]): perfectly
  * linear fixtures give EXACT ±1.0 (the moment identity cancels to
  * 2dx/√(4dx²) with every intermediate an exact integer), null rows
  * drop from every moment, and the output enumerates each unordered
  * pair once. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("perfect linear relations give exact ±1.0; pairs enumerate once") {
    val df = Seq(
      (BigDecimal("1.00"), BigDecimal("2.00"), BigDecimal("3.00")),
      (BigDecimal("2.00"), BigDecimal("4.00"), BigDecimal("2.00")),
      (BigDecimal("3.00"), BigDecimal("6.00"), BigDecimal("1.00")))
      .toDF("a", "b", "c")
      .select(col("a").cast("decimal(18,2)").as("a"),
        col("b").cast("decimal(18,2)").as("b"),
        col("c").cast("decimal(18,2)").as("c"))
    val got = Stats.corrMatrix(df, Seq("a", "b", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(got(("a", "b")) == ((3L, 1.0)))   // b = 2a
    assert(got(("a", "c")) == ((3L, -1.0)))  // c = 4 - a
    assert(got(("b", "c")) == ((3L, -1.0)))
  }

  test("key-skew profile: hand-computed shape stats on a skewed fixture") {
    // keys: a x4, b x2, c x1, d x1 -> counts [1,1,2,4]
    val df = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .toDF("k")
    val r = Stats.keySkewProfile(df, "k").head()
    assert(r.getLong(0) === 4L)        // n_keys
    assert(r.getLong(1) === 8L)        // n_rows
    assert(r.getLong(2) === 1L)        // min
    assert(r.getLong(3) === 4L)        // max
    assert(r.getDouble(4) === 1.5)     // p50 of [1,1,2,4]
    assert(r.getDouble(5) === 3.4)     // p90: 2 + 0.7*(4-2)
    assert(math.abs(r.getDouble(6) - 3.94) < 1e-9) // p99
    assert(r.getDouble(7) === 2.0)     // skew: max/mean = 4/(8/4)
  }

  test("PSI drift: identical months score ~0, a shifted month flags, cur-only types drop") {
    import java.sql.Timestamp
    val jan = Timestamp.valueOf("2024-01-15 12:00:00")
    val jun = Timestamp.valueOf("2024-06-15 12:00:00")
    def ev(id: Long, t: Timestamp, typ: String, v: Double) =
      (id, t, id, typ, v, "{}")
    // "stable": same values both months → PSI ≈ 0 (smoothing only)
    val stable = (1 to 50).flatMap(i => Seq(
      ev(i, jan, "stable", i.toDouble), ev(i + 100, jun, "stable", i.toDouble)))
    // "shifted": ref in [1,50], cur clamped far right in [90,100]
    val shifted = (1 to 50).map(i => ev(i + 200, jan, "shifted", i.toDouble)) ++
      (1 to 50).map(i => ev(i + 300, jun, "shifted", 90.0 + (i % 11)))
    // cur-month-only type: no reference quantizer → excluded
    val curOnly = (1 to 10).map(i => ev(i + 400, jun, "cur_only", i.toDouble))
    val df = (stable ++ shifted ++ curOnly)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Stats.featureDriftPsi(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got.keySet == Set("stable", "shifted"))
    val (snr, snc, spsi, sflag) = got("stable")
    assert(snr == 50L && snc == 50L)
    assert(spsi >= 0.0 && spsi < 0.01, s"identical months scored $spsi")
    assert(!sflag)
    val (dnr, dnc, dpsi, dflag) = got("shifted")
    assert(dnr == 50L && dnc == 50L)
    assert(dpsi > 1.0, s"shifted month scored only $dpsi")
    assert(dflag)
  }

  test("rows with any null measure are excluded from every moment") {
    val df = Seq(
      (Some(BigDecimal("1.00")), Some(BigDecimal("2.00"))),
      (Some(BigDecimal("2.00")), None),
      (Some(BigDecimal("3.00")), Some(BigDecimal("6.00"))))
      .toDF("a", "b")
      .select(col("a").cast("decimal(18,2)").as("a"),
        col("b").cast("decimal(18,2)").as("b"))
    val row = Stats.corrMatrix(df, Seq("a", "b")).head()
    assert(row.getLong(2) === 2L)       // the null row dropped
    assert(row.getDouble(3) === 1.0)    // the two surviving points are linear
  }
}
