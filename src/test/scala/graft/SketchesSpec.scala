package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** The deterministic HLL sketch must estimate within its theoretical
  * error envelope (±1.04/√m ≈ 13% standard error at m=64) across
  * cardinalities hitting both the linear-counting and raw-formula
  * branches, and must be bit-stable run to run.
  */
class SketchesSpec extends SparkSpec {

  import spark.implicits._

  private def estFor(n: Int): (Long, Double) = {
    val df = (1 to n).map(i => ("g", s"user_$i")).toDF("grp", "k")
    val r = Sketches.hllDistinct(df, Seq("grp"), col("k")).head()
    (r.getAs[Long]("n_exact"), r.getAs[Double]("hll_estimate"))
  }

  test("estimates stay within 3 standard errors across cardinalities") {
    // 1.04/sqrt(64) ~ 13% standard error; 3 sigma ~ 39%
    for (n <- Seq(10, 50, 150, 1000, 5000)) {
      val (exact, est) = estFor(n)
      assert(exact === n.toLong)
      val rel = math.abs(est - n) / n
      assert(rel < 0.39, s"n=$n est=$est rel=$rel")
    }
  }

  test("estimate is deterministic and duplicate-insensitive") {
    val once = estFor(500)._2
    val again = estFor(500)._2
    assert(once === again)
    // duplicates must not move the estimate: max(rho) is idempotent
    val dup = ((1 to 500) ++ (1 to 500)).map(i => ("g", s"user_$i")).toDF("grp", "k")
    val dupEst = Sketches.hllDistinct(dup, Seq("grp"), col("k"))
      .head().getAs[Double]("hll_estimate")
    assert(dupEst === once)
  }

  test("histogram quantiles track exact percentiles within a bin width") {
    // uniform 1..10000: exact q-quantile ≈ q·10000, bin width ≈ 39
    val df = (1 to 10000).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val out = Sketches.histogramQuantiles(df, Seq("grp"), col("v"))
      .collect().map(r => r.getDouble(1) -> r.getDouble(3)).toMap
    val width = (10000.0 - 1.0) / Sketches.HistBins
    for ((q, est) <- out) {
      val exact = q * 10000
      assert(math.abs(est - exact) <= width + 1,
        s"q=$q est=$est exact~$exact width=$width")
    }
    assert(out.keySet === Sketches.HistQs.toSet)
    // monotone in q
    val sorted = Sketches.HistQs.sorted.map(out)
    assert(sorted === sorted.sorted)
  }

  test("histogram quantiles: constant group returns the constant; one row per group x q") {
    val df = (Seq.fill(50)(("c", 7.5)) ++ (1 to 100).map(i => ("u", i.toDouble)))
      .toDF("grp", "v")
    val rows = Sketches.histogramQuantiles(df, Seq("grp"), col("v")).collect()
    assert(rows.length === 2 * Sketches.HistQs.length)
    rows.filter(_.getString(0) == "c").foreach { r =>
      assert(r.getDouble(3) === 7.5)
      assert(r.getLong(2) === 50L)
    }
  }

  test("range query over stored daily registers equals the direct range sketch") {
    import java.sql.Timestamp
    // 6 days of keyed events; range covers days 2..4
    val df = (0 until 6).flatMap(day => (0 until 200).map(k =>
      (Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00"), s"u${day * 50 + k}")))
      .toDF("ts", "key")
    val regs = Sketches.hllRegisters(df,
      to_date(col("ts")), "day", col("key"))
    val sel = regs.filter(col("day").between("2024-01-02", "2024-01-04"))
    val merged = sel.groupBy("__reg").agg(max(col("__mj")).as("__mj"))
    val viaRegisters = Sketches.hllEstimateFromRegisters(merged)
      .as[Double].head()
    val direct = Sketches.hllDistinct(
        df.filter(to_date(col("ts")).between("2024-01-02", "2024-01-04"))
          .withColumn("g", lit("all")),
        Seq("g"), col("key"))
      .select("hll_estimate").as[Double].head()
    assert(viaRegisters === direct) // bit-equal: max is associative
  }

  test("merged per-partition sketches equal the directly-built global sketch") {
    // 4 partitions with overlapping key ranges: merge must dedup across
    // partitions exactly like one global sketch would.
    val df = (1 to 4).flatMap(p => (p * 100 until p * 100 + 300)
      .map(k => (s"part$p", s"k$k"))).toDF("part", "key")
    val merged = Sketches.hllMergedDistinct(df, "part", col("key")).collect()(0)
    val direct = Sketches
      .hllDistinct(df.withColumn("g", lit("all")), Seq("g"), col("key")).collect()(0)
    assert(merged.getLong(0) === 4L)                       // n_sketches
    assert(merged.getLong(1) === direct.getLong(1))        // n_exact
    assert(merged.getDouble(2) === direct.getDouble(2))    // bit-equal estimate
  }

  test("inclusion-exclusion overlap estimate tracks the exact intersection") {
    // click users 0..599, purchase users 400..999 → overlap 200 of
    // 1000; intersection error compounds three ±13% sketches, so the
    // tolerance is wide but the estimate must clearly beat both the
    // zero-overlap and full-overlap hypotheses
    val rows = (0 until 600).map(u => ("click", u.toLong)) ++
      (400 until 1000).map(u => ("purchase", u.toLong))
    val events = rows.toDF("event_type", "user_id")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")))
      .withColumn("event_id", col("user_id"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val r = graft.marts.EventMarts.hllOverlapUsers(events).collect()(0)
    assert(r.getLong(0) === 200L) // exact both-types users
    val est = r.getDouble(4)
    assert(est > 50 && est < 400, s"overlap estimate $est too far from 200")
    // union estimate is bounded by the singles (register max dominance)
    assert(r.getDouble(3) >= math.max(r.getDouble(1), r.getDouble(2)) * 0.99)
  }

  test("joinSizeEstimate: upper bound on the exact join size, exact on one key") {
    // A = {1×3, 2×1}, B = {1×1, 2×2, 3×1}: true = 3·1 + 1·2 = 5
    val a = Seq(1L, 1L, 1L, 2L).toDF("k")
    val b = Seq(1L, 2L, 2L, 3L).toDF("k")
    val r = Sketches.joinSizeEstimate(a, b, "k").collect().head
    assert(r.getLong(0) === 2L) // shared keys {1, 2}
    assert(r.getLong(1) === 5L)
    assert(r.getLong(2) >= 5L)  // CMS inner product never undercounts
    assert(r.getDouble(3) === (r.getLong(2) - 5L).toDouble / 5.0)
    // single shared key: every hash row holds exactly 3·4 -> est exact
    val one = Sketches.joinSizeEstimate(
      Seq(7L, 7L, 7L).toDF("k"), Seq(7L, 7L, 7L, 7L).toDF("k"), "k")
      .collect().head
    assert((one.getLong(0), one.getLong(1), one.getLong(2)) === ((1L, 12L, 12L)))
    assert(one.getDouble(3) === 0.0)
    // disjoint keys: true size 0, rel_err pinned to 0 by the guard
    val disj = Sketches.joinSizeEstimate(
      Seq(1L).toDF("k"), Seq(2L).toDF("k"), "k").collect().head
    assert((disj.getLong(0), disj.getLong(1)) === ((0L, 0L)))
    assert(disj.getDouble(3) === 0.0)
  }
}
