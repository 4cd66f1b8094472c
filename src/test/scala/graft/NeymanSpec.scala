package graft

import org.apache.spark.sql.functions._
import graft.llm.Splits

/** Splits.neymanAllocation: allocations integrate to the budget
  * exactly (largest remainder), planted high-variance strata pull
  * budget beyond their population share, and the Neyman design
  * variance never exceeds proportional's. */
class NeymanSpec extends SparkSpec {
  import spark.implicits._

  test("planted variance shifts budget; totals and ordering hold") {
    // two equal-population strata: 'flat' docs all length 100,
    // 'wild' docs alternating 10/1000 — Neyman must move budget to
    // 'wild' while proportional splits 50/50
    val docs = (0L until 200L).map { i =>
      if (i < 100) (i, "flat", 100L)
      else (i, "wild", if (i % 2 == 0) 10L else 1000L)
    }.toDF("doc_id", "lang", "n_chars")
    val rows = Splits.neymanAllocation(docs)
      .select("lang", "n_pop", "n_prop", "n_neyman", "v_neyman", "v_prop")
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows("flat")._2 === 100L && rows("wild")._2 === 100L)
    // both allocations integrate to the budget exactly
    assert(rows.values.map(_._3).sum === Splits.NeymanBudget)
    assert(rows.values.map(_._4).sum === Splits.NeymanBudget)
    // proportional is population-share; Neyman shifts hard to 'wild'
    assert(rows("flat")._3 === 500L && rows("wild")._3 === 500L)
    assert(rows("wild")._4 > 900L,
      s"high-variance stratum got ${rows("wild")._4}")
    // optimal design variance <= proportional (equality iff equal sds)
    val (vn, vp) = (rows("flat")._5, rows("flat")._6)
    assert(vn < vp, s"v_neyman $vn must beat v_prop $vp here")
  }

  test("singleton stratum draws zero Neyman budget, not NULL poison") {
    // ADVICE r15: a stratum with n_pop == 1 has no sample stddev; it
    // must fold as zero variance (zero Neyman share) instead of
    // NULL-poisoning t_nhsh and collapsing EVERY stratum's allocation
    val docs = ((0L until 100L).map(i =>
      (i, "vary", if (i % 2 == 0) 90L else 110L)) :+
      (100L, "lone", 5000L)).toDF("doc_id", "lang", "n_chars")
    val rows = Splits.neymanAllocation(docs)
      .select("lang", "n_pop", "sd_chars", "n_prop", "n_neyman")
      .as[(String, Long, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows("lone")._3 === 0.0)
    assert(rows("lone")._5 === 0L,
      s"singleton stratum allocated ${rows("lone")._5}")
    // budget conservation survives the singleton
    assert(rows.values.map(_._4).sum === Splits.NeymanBudget)
    assert(rows.values.map(_._5).sum === Splits.NeymanBudget)
  }

  test("real corpus: budget conservation and design-variance ordering") {
    val rows = Models.neymanAllocation(spark, sf)
      .select("n_prop", "n_neyman", "v_neyman", "v_prop")
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).sum === Splits.NeymanBudget)
    assert(rows.map(_._2).sum === Splits.NeymanBudget)
    rows.foreach { case (_, _, vn, vp) => assert(vn <= vp) }
  }
}
