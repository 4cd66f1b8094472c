package graft

import java.sql.Date
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.marts.StatsMarts

/** StatsMarts family: hand-computed oracles on tiny fixtures, the
  * documented int64 headroom on the gated data, and the estimator
  * invariants (Gini bounds, Lorenz monotonicity, KM monotone
  * non-increasing survival, KS of identical/disjoint samples). */
class StatsMartsSpec extends SparkSpec {
  import spark.implicits._

  private def ordersOf(rows: Seq[(Long, String, BigDecimal)]): DataFrame =
    rows.map { case (cust, d, total) =>
      (cust, Date.valueOf(d), total.setScale(2))
    }.toDF("customer_id", "ordered_at", "order_total")

  // ---- Gini / Lorenz ----

  test("gini of a perfectly equal distribution is 0") {
    val df = ordersOf((1L to 4L).map(c => (c, "2001-01-01", BigDecimal(10))))
    val g = StatsMarts.revenueGini(df).select("gini").as[Double].head()
    assert(g === 0.0)
  }

  test("gini matches the hand-computed rank formula") {
    // cents ascending 0,0,0,1000: G = (2*4*1000 - 5*1000)/(4*1000) = 0.75
    val df = ordersOf(Seq(
      (1L, "2001-01-01", BigDecimal(0)), (2L, "2001-01-01", BigDecimal(0)),
      (3L, "2001-01-01", BigDecimal(0)), (4L, "2001-01-01", BigDecimal(10))))
    val r = StatsMarts.revenueGini(df)
      .select("n_customers", "total_cents", "gini")
      .as[(Long, Long, Double)].head()
    assert(r === ((4L, 1000L, 0.75)))
  }

  test("lorenz deciles are monotone and end at share 1") {
    val df = Models.stgOrders(spark, sf)
    val rows = StatsMarts.lorenzDeciles(df)
      .orderBy("decile")
      .select("decile", "cum_share").as[(Int, Double)].collect()
    assert(rows.map(_._1).toSeq === (1 to 10))
    assert(rows.sliding(2).forall { case Array(a, b) => b._2 >= a._2 })
    assert(math.abs(rows.last._2 - 1.0) < 1e-12)
  }

  test("gini int64 headroom holds on the gated data") {
    val df = Models.stgOrders(spark, sf)
    val (n, tot) = StatsMarts.revenueGini(df)
      .select("n_customers", "total_cents").as[(Long, Long)].head()
    // sum(rank*cents) <= n * total — assert the documented bound
    assert(BigInt(n) * BigInt(tot) < BigInt(Long.MaxValue) / 4,
      s"rank-weighted sum bound too close to 2^63: n=$n total=$tot")
  }

  // ---- Benford ----

  test("benford digit extraction and chi2 terms are exact") {
    // totals 1.00, 12.34, 19.99, 2.50, 95.00 → cents 100,1234,1999,250,9500
    // first digits 1,1,1,2,9
    val df = ordersOf(Seq(
      (1L, "2001-01-01", BigDecimal("1.00")),
      (2L, "2001-01-01", BigDecimal("12.34")),
      (3L, "2001-01-01", BigDecimal("19.99")),
      (4L, "2001-01-01", BigDecimal("2.50")),
      (5L, "2001-01-01", BigDecimal("95.00"))))
    val rows = StatsMarts.benfordDigits(df)
      .select("digit", "n_obs").as[(Int, Long)].collect().toMap
    // digit spine (r15 advisory): absent digits appear with n_obs = 0 so
    // their full n·p_d χ² term is counted — 9 rows ALWAYS
    assert(rows === (1 to 9).map(d =>
      d -> Map(1 -> 3L, 2 -> 1L, 9 -> 1L).getOrElse(d, 0L)).toMap)
    val s = StatsMarts.benfordSummary(df)
      .select("n", "df").as[(Long, Int)].head()
    assert(s === ((5L, 8)))
  }

  test("benford chi2 counts absent digits' full n*p terms (r15 advisory)") {
    // all five totals start with digit 1 → digits 2..9 are absent; a
    // groupBy-only chain would fold chi2 over ONE term and understate it
    val df = ordersOf(Seq(
      (1L, "2001-01-01", BigDecimal("1.00")),
      (2L, "2001-01-01", BigDecimal("12.34")),
      (3L, "2001-01-01", BigDecimal("19.99")),
      (4L, "2001-01-01", BigDecimal("150.00")),
      (5L, "2001-01-01", BigDecimal("1999.99"))))
    val terms = StatsMarts.benfordDigits(df)
      .select("digit", "chi2_term").as[(Int, Double)].collect().toMap
    assert(terms.size === 9)
    (2 to 9).foreach { d =>
      val exp = 5.0 * StatsMarts.BenfordP(d)
      assert(math.abs(terms(d) - exp) < 1e-12,
        s"absent digit $d must contribute its full n*p term")
    }
    val chi2 = StatsMarts.benfordSummary(df).select("chi2").as[Double].head()
    // hand fold in digit order, matching the ordered-left-fold contract
    val expChi2 = (1 to 9).foldLeft(0.0)((acc, d) => acc + terms(d))
    assert(chi2 === expChi2)
  }

  test("benford shares sum to the observed digits' mass") {
    val df = Models.stgOrders(spark, sf)
    val rows = StatsMarts.benfordDigits(df)
      .select("n_obs", "n").as[(Long, Long)].collect()
    assert(rows.map(_._1).sum === rows.head._2)
  }

  // ---- KS ----

  test("ks of identical samples is 0 and disjoint samples is 1") {
    // identical: same totals on weekday(Mon 2001-01-01) vs weekend(Sat 2001-01-06)
    val same = ordersOf(Seq(
      (1L, "2001-01-01", BigDecimal(10)), (2L, "2001-01-06", BigDecimal(10)),
      (3L, "2001-01-01", BigDecimal(20)), (4L, "2001-01-06", BigDecimal(20))))
    val ks0 = StatsMarts.ksWeekendDrift(same).select("ks_stat").as[Double].head()
    assert(ks0 === 0.0)
    val disjoint = ordersOf(Seq(
      (1L, "2001-01-01", BigDecimal(10)), (2L, "2001-01-01", BigDecimal(20)),
      (3L, "2001-01-06", BigDecimal(30)), (4L, "2001-01-06", BigDecimal(40))))
    val r = StatsMarts.ksWeekendDrift(disjoint)
      .select("ks_stat", "ks_at_cents").as[(Double, Long)].head()
    assert(r._1 === 1.0)
    assert(r._2 === 2000L) // first value where the gap peaks
  }

  test("ks one-sided-empty slice gives null stat and a defined false verdict (r15 advisory)") {
    // weekday-only slice: no weekend sample → no two-sample statistic;
    // pre-fix this divided by zero into null/NaN reject_05
    val wdOnly = ordersOf(Seq(
      (1L, "2001-01-01", BigDecimal(10)), (2L, "2001-01-02", BigDecimal(20))))
    val r = StatsMarts.ksWeekendDrift(wdOnly)
      .select("ks_stat", "crit_05", "reject_05")
      .as[(Option[Double], Option[Double], Boolean)].head()
    assert(r._1.isEmpty && r._2.isEmpty)
    assert(r._3 === false)
  }

  test("ks int64 headroom holds on the gated data") {
    val df = Models.stgOrders(spark, sf)
    val (na, nb) = StatsMarts.ksWeekendDrift(df)
      .select("n_weekday", "n_weekend").as[(Long, Long)].head()
    assert(BigInt(na) * BigInt(nb) < BigInt(Long.MaxValue),
      s"cum*n bound exceeds 2^63: $na * $nb")
  }

  // ---- Kaplan-Meier ----

  test("kaplan-meier matches the hand-computed product") {
    // run date 2001-08-15, horizon 90: last order before 2001-05-17 = churn
    // c1: first 2001-01-01 last 2001-01-31 → churn, t=30
    // c2: first 2001-01-01 last 2001-03-02 → churn, t=60
    // c3: first 2001-01-01 last active 2001-08-01 → censored, t=226
    // c4: first 2001-02-01 last 2001-03-03 → churn, t=30
    val df = ordersOf(Seq(
      (1L, "2001-01-01", BigDecimal(1)), (1L, "2001-01-31", BigDecimal(1)),
      (2L, "2001-01-01", BigDecimal(1)), (2L, "2001-03-02", BigDecimal(1)),
      (3L, "2001-01-01", BigDecimal(1)), (3L, "2001-08-01", BigDecimal(1)),
      (4L, "2001-02-01", BigDecimal(1)), (4L, "2001-03-03", BigDecimal(1))))
    val rows = StatsMarts.customerSurvivalKm(df)
      .orderBy("t_days")
      .select("t_days", "n_risk", "d_events", "c_censored", "s_scaled")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    // t=30: n=4 d=2 → S = 1e9*2 div 4 = 500000000
    // t=60: n=2 d=1 → S = 5e8*1 div 2 = 250000000
    // t=226: n=1 d=0 c=1 → S unchanged
    assert(rows === Seq(
      (30, 4L, 2L, 0L, 500000000L),
      (60, 2L, 1L, 0L, 250000000L),
      (226, 1L, 0L, 1L, 250000000L)))
  }

  test("km survival is monotone non-increasing on the gated data") {
    val df = Models.stgOrders(spark, sf)
    val s = StatsMarts.customerSurvivalKm(df)
      .orderBy("t_days").select("s_scaled").as[Long].collect()
    assert(s.nonEmpty)
    assert(s.sliding(2).forall { case Array(a, b) => b <= a })
  }

  // ---- basket rules ----

  test("basket rules match hand counts on a tiny market") {
    // orders: {A,B}, {A,B}, {A,B,C}, {A}, {C}  (5 orders)
    val items = Seq(
      (1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 30L), (4L, 10L), (5L, 30L))
      .toDF("order_id", "product_id")
    val rules = StatsMarts.basketRules(items)
      .where(col("product_a") === 10L && col("product_b") === 20L)
      .select("pair_n", "a_n", "b_n", "n_orders",
        "support", "conf_a_to_b", "conf_b_to_a", "lift")
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)].head()
    // pair {10,20}: 3 times; supp(10)=4, supp(20)=3, n=5
    assert(rules === ((3L, 4L, 3L, 5L, 3.0 / 5, 3.0 / 4, 3.0 / 3,
      15.0 / 12.0)))
  }

  test("basket rules: a mega-basket is capped out of every count and reported") {
    // the 5 hand-counted orders plus order 99: a degenerate basket of
    // BasketSizeCap+1 products (containing 10 and 20) — without the
    // cap it alone would add (cap+1)·cap/2 pairs
    val base = Seq(
      (1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 30L), (4L, 10L), (5L, 30L))
    val mega = (0L to StatsMarts.BasketSizeCap).map(k => (99L, 10L + k))
    val rules = StatsMarts.basketRules((base ++ mega).toDF("order_id", "product_id"))
    val r = rules.where(col("product_a") === 10L && col("product_b") === 20L)
      .select("pair_n", "a_n", "b_n", "n_orders",
        "n_capped_orders", "a_capped_n", "b_capped_n")
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    // counts identical to the uncapped 5-order fixture: the mega
    // basket is excluded from pairs, supports, AND the denominator —
    // and the truncation is reported (1 capped order, containing both)
    assert(r === ((3L, 4L, 3L, 5L, 1L, 1L, 1L)))
    // no pair involving a mega-only product survives (those products
    // co-occur ONLY inside the capped basket)
    assert(rules.where(col("product_a") > 40L || col("product_b") > 40L)
      .count() === 0L)
  }

  test("lift is symmetric in the pair and conf directions are not") {
    val rules = StatsMarts.basketRules(
      Models.stgOrderItems(spark, sf)).collect()
    assert(rules.nonEmpty)
  }

  // ---- migration matrix / gap histogram ----

  test("migration matrix: quintiles move as planted, absences map to 0") {
    // before (<= 1995-06-30): c1..c5 spend ascending; after: reversed,
    // c5 absent, c6 appears
    val before = (1L to 5L).map(c =>
      (c, c, Date.valueOf("1995-01-01"), BigDecimal(c * 100)))
    val after = (1L to 4L).map(c =>
      (c + 10, c, Date.valueOf("1996-01-01"), BigDecimal((5 - c) * 100))) :+
      ((20L, 6L, Date.valueOf("1996-01-01"), BigDecimal(999)))
    val orders = (before ++ after).map { case (o, c, d, t) =>
      (o, c, d, t.setScale(2)) }
      .toDF("order_id", "customer_id", "ordered_at", "order_total")
    val cells = StatsMarts.customerMigration(orders)
      .select("q_before", "q_after", "n_customers")
      .as[(Int, Int, Long)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    // c1: before q1, after spend 400 (highest of the 5 after-side) ->
    // after ranks: c6=999 q5? after side: spends c1=400,c2=300,c3=200,
    // c4=100,c6=999 -> ascending c4,c3,c2,c1,c6 -> q 1,2,3,4,5
    assert(cells(((1, 4))) === 1L)
    assert(cells(((5, 0))) === 1L) // c5 absent after
    assert(cells(((0, 5))) === 1L) // c6 absent before
    assert(cells.values.sum === 6L)
  }

  test("gap histogram: hand-planted gaps bucket and share correctly") {
    val orders = Seq(
      (1L, 1L, "2001-01-01"), (2L, 1L, "2001-01-04"), (3L, 1L, "2001-01-20"),
      (4L, 2L, "2001-03-01"), (5L, 2L, "2001-03-02"))
      .map { case (o, c, d) => (o, c, Date.valueOf(d), BigDecimal(10).setScale(2)) }
      .toDF("order_id", "customer_id", "ordered_at", "order_total")
    // gaps: c1: 3 days (week 0), 16 days (week 2); c2: 1 day (week 0)
    val rows = StatsMarts.orderGapStats(orders)
      .select("gap_weeks", "n_gaps", "share")
      .as[(Int, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(0) === ((2L, 2.0 / 3)))
    assert(rows(2) === ((1L, 1.0 / 3)))
  }

  // ---- chi-square independence ----

  test("chi2 cells match the hand-computed contingency arithmetic") {
    // 2 segments x 2 priorities: A:(hi 3, lo 1), B:(hi 1, lo 3); n=8
    val orders = Seq(
      (1L, "hi"), (1L, "hi"), (1L, "hi"), (1L, "lo"),
      (2L, "hi"), (2L, "lo"), (2L, "lo"), (2L, "lo"))
      .zipWithIndex.map { case ((c, p), i) => (i.toLong, c, p) }
      .toDF("order_id", "customer_id", "order_priority")
    val custs = Seq((1L, "A"), (2L, "B")).toDF("customer_id", "market_segment")
    val cells = StatsMarts.segmentPriorityChi2(orders, custs)
      .select("market_segment", "order_priority", "n_obs", "expected_n", "chi2_term")
      .as[(String, String, Long, Double, Double)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4, r._5))).toMap
    // every margin is 4 -> expected 2 everywhere; term = (o-2)^2/2 = 0.5
    assert(cells(("A", "hi")) === ((3L, 2.0, 0.5)))
    assert(cells(("B", "lo")) === ((3L, 2.0, 0.5)))
    assert(cells(("A", "lo")) === ((1L, 2.0, 0.5)))
    val v = StatsMarts.segmentPriorityVerdict(orders, custs)
      .select("n", "n_cells", "chi2", "df", "reject_05")
      .as[(Long, Long, Double, Int, Boolean)].head()
    assert(v === ((8L, 4L, 2.0, 16, false)))
  }

  // ---- grouped OLS ----

  test("ols recovers an exact line per group") {
    // product 10: revenue 1000.0000 + 25.0000/month (scale-4 units:
    // 10_000_000 + 250_000 x); product 20: flat
    val orders = (1 to 6).map(m =>
      (m.toLong, 99L, java.sql.Date.valueOf(f"1992-0$m%01d-15")))
      .toDF("order_id", "customer_id", "ordered_at")
    val items = (1 to 6).flatMap { m =>
      Seq((m.toLong, 10L, BigDecimal(1000 + 25 * m)),
        (m.toLong, 20L, BigDecimal(777)))
    }.map { case (o, p, d) => (o, p, d.setScale(4)) }
      .toDF("order_id", "product_id", "discounted_price")
    val rows = StatsMarts.productTrendOls(items, orders)
      .select("product_id", "n_months", "slope", "intercept")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows(10L)._1 === 6L)
    assert(rows(10L)._2 === 250000.0) // 25.0000/month in scale-4 units
    assert(rows(10L)._3 === 10000000.0)
    assert(rows(20L)._2 === 0.0)
  }

  test("ols int64 headroom holds on the gated data") {
    val df = StatsMarts.productTrendOls(
      Models.stgOrderItems(spark, sf), Models.stgOrders(spark, sf))
    val (mx, _) = df.agg(max(abs(col("num"))), max(abs(col("den"))))
      .as[(Long, Long)].head()
    assert(BigInt(mx) < BigInt(Long.MaxValue) / 1000,
      s"OLS numerator too close to 2^63: $mx")
  }

  // ---- jw pairs ----

  test("jw pairs resolve the distinct dictionary with row counts") {
    // 'cold gear' appears 3x, 'old gear' 2x — the typo family differs
    // in the FIRST token (length band keeps it; token blocking would
    // lose it); 'totally other' is out of band and out of range
    val p = Seq(
      (1L, "cold gear"), (2L, "cold gear"), (3L, "cold gear"),
      (4L, "old gear"), (5L, "old gear"),
      (6L, "totally other name"))
      .toDF("product_id", "product_name")
    val rows = StatsMarts.jwNamePairs(p)
      .select("name_a", "name_b", "n_rows_a", "n_rows_b", "jw")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(rows.length === 1)
    val (a, b, na, nb, jw) = rows.head
    assert((a, b, na, nb) === (("cold gear", "old gear", 3L, 2L)))
    assert(jw >= StatsMarts.JwThreshold)
    // each pair meets exactly once despite the 5-way band explode
  }

  test("jw recall gate detects pairs the length band cannot reach") {
    // 'abcdefghij' vs 'abcdefghijklm': 10 matched chars, 4-char JW
    // prefix boost -> jw ~ 0.937 >= 0.9, but the length gap is 3 >
    // JwLenBand=2, so the banded candidates MISS a truth pair and the
    // gate must report recall < 1 — proof the harness prices the
    // blocking scheme rather than rubber-stamping it.
    val p = Seq(
      (1L, "abcdefghij"), (2L, "abcdefghijklm"),
      (3L, "cold gear"), (4L, "old gear"))
      .toDF("product_id", "product_name")
    val r = StatsMarts.jwRecall(p)
      .select("n_truth", "n_candidates", "n_hits", "recall", "precision")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r._1 === 2L)   // both high-JW pairs are truth
    assert(r._2 === 1L)   // band reaches only the cold/old pair
    assert(r._3 === 1L)
    assert(r._4 === 0.5)
    assert(r._5 === 1.0)  // candidates are threshold-filtered truth
  }

  test("jw recall is 1.0 on the driver catalog (documented claim)") {
    val r = StatsMarts.jwRecall(Models.stgProducts(spark, sf))
      .select("recall").as[Double].head()
    assert(r === 1.0)
  }

  // ---- event-type cross-correlation ----

  test("xcorr finds a planted 2-day lead with r = 1 at the peak lag") {
    // 'view' daily volume follows a deterministic non-constant curve;
    // 'purchase' repeats the SAME curve shifted 2 days later — the
    // (view, purchase) peak must sit at lag +2 with r == 1.0 there
    val base = java.sql.Timestamp.valueOf("2024-01-01 12:00:00").getTime
    def day(t: Int) = new java.sql.Timestamp(base + t * 86400000L)
    def vol(t: Int) = 3 + (t * 7) % 11 // non-constant, deterministic
    val events = (0 until 30).flatMap { t =>
      (0 until vol(t)).map(i =>
        (t.toLong * 1000 + i, 1L, "view", day(t))) ++
        (if (t >= 2) (0 until vol(t - 2)).map(i =>
          (90000L + t * 1000 + i, 1L, "purchase", day(t)))
        else Seq.empty)
    }.toDF("event_id", "user_id", "event_type", "ts")
    val rows = StatsMarts.eventTypeXcorr(events)
      .select("x_type", "y_type", "lag", "n_days", "pearson_r", "is_peak")
      .as[(String, String, Int, Long, Option[Double], Boolean)].collect()
    val vp = rows.filter(r => r._1 == "view" && r._2 == "purchase")
    assert(vp.length === 2 * StatsMarts.XCorrMaxLag + 1)
    val peak = vp.filter(_._6)
    assert(peak.length === 1)
    assert(peak.head._3 === 2, s"peak lag ${peak.head._3}")
    assert(math.abs(peak.head._5.get - 1.0) < 1e-12)
    // the mirror-image pair peaks at the negated lag
    val pv = rows.filter(r => r._1 == "purchase" && r._2 == "view")
    assert(pv.filter(_._6).head._3 === -2)
    // overlap bookkeeping at lag +7: view days t ∈ [0,29], purchase
    // days t+7 ∈ [2,29] ⇒ t ∈ [0,22] = 23 overlapping days
    val l7 = vp.find(_._3 === 7).get
    assert(l7._4 === 23L, s"lag+7 overlap ${l7._4}")
  }

  test("xcorr on the gated events: full matrix, one peak per pair, r bounded") {
    val rows = Models.eventTypeXcorr(spark, sf)
      .select("x_type", "y_type", "lag", "pearson_r", "is_peak")
      .as[(String, String, Int, Option[Double], Boolean)].collect()
    val pairs = rows.map(r => (r._1, r._2)).distinct
    assert(pairs.length === 20, s"expected 5x4 ordered pairs, got ${pairs.length}")
    pairs.foreach { p =>
      val g = rows.filter(r => (r._1, r._2) == p)
      assert(g.length === 2 * StatsMarts.XCorrMaxLag + 1)
      assert(g.count(_._5) === 1, s"pair $p peak count")
    }
    rows.flatMap(_._4).foreach(r => assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9))
  }
}
