package graft

import graft.llm.HashEmbed

/** HashEmbed.hybridRankMetrics on hand-built rank lists: MRR/nDCG
  * formulas, the perfect-list identity, and the absent-query zero
  * contract. */
class RankMetricsSpec extends SparkSpec {
  import spark.implicits._

  private val d = HashEmbed.NdcgDiscounts
  private val p = HashEmbed.NdcgIdeal

  test("hand-built lists score the textbook values") {
    // q1: exact {10,11,12}; served: miss,10,11,miss,miss
    // q2: exact {20,21}; served exactly those, in order
    // q3: exact {30}; the index returned nothing
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L),
      (3L, 30L)).toDF("query_doc_id", "doc_id")
    val indexed = Seq((1L, 99L, 1), (1L, 10L, 2), (1L, 11L, 3), (1L, 98L, 4),
      (1L, 97L, 5), (2L, 20L, 1), (2L, 21L, 2))
      .toDF("query_doc_id", "doc_id", "rank")
    val got = HashEmbed.hybridRankMetrics(indexed, exact)
      .collect().map(r => r.getLong(0) -> r).toMap
    val q1 = got(1L)
    assert(q1.getAs[Long]("n_rel") === 3L && q1.getAs[Long]("n_hits") === 2L)
    assert(q1.getAs[Int]("first_hit_rank") === 2)
    assert(q1.getAs[Double]("mrr") === 0.5)
    val dcg1 = 0.0 + d(1) + d(2) // fixed-order: ranks 2 and 3 hit
    assert(q1.getAs[Double]("dcg") === 0.0 + 0.0 + d(1) + d(2) + 0.0 + 0.0)
    assert(q1.getAs[Double]("ndcg") === (0.0 + 0.0 + d(1) + d(2) + 0.0 + 0.0) / p(2))
    assert(dcg1 > 0) // silence unused-val lint paranoia
    // a served list that IS the ideal list scores exactly 1.0
    val q2 = got(2L)
    assert(q2.getAs[Double]("mrr") === 1.0)
    assert(q2.getAs[Double]("ndcg") === (d(0) + 0.0 + d(1) + 0.0 + 0.0 + 0.0) / p(1))
    // an index that returns nothing scores 0, not null
    val q3 = got(3L)
    assert(q3.getAs[Long]("n_hits") === 0L && q3.getAs[Double]("mrr") === 0.0)
    assert(q3.getAs[Double]("dcg") === 0.0 && q3.getAs[Double]("ndcg") === 0.0)
    assert(q3.isNullAt(q3.fieldIndex("first_hit_rank")))
  }

  test("discount literals are quantized and ideal sums are their fixed-order prefixes") {
    assert(d.head === 1.0)
    assert(d === d.sorted.reverse) // strictly decaying discounts
    assert(p === d.scanLeft(0.0)(_ + _).tail)
  }
}
