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
