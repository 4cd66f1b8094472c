package graft

import graft.llm.Dedup

/** Dedup.lshRecallStats: counts and zero-guards on synthetic pair
  * tables (the registered query's inputs are the Mat'd minhash /
  * exact-Jaccard pair tables; their own correctness is gated by the
  * driver oracle). */
class LshRecallSpec extends SparkSpec {
  import spark.implicits._

  private def truth(rows: (Long, Long, Double)*) =
    rows.toSeq.toDF("doc_a", "doc_b", "jaccard_est")
  private def cand(rows: (Long, Long)*) =
    rows.toSeq.toDF("doc_a", "doc_b")

  test("recall and precision count threshold-filtered truth hits") {
    // truth >= 0.5: (1,2), (3,4), (5,6); candidates hit two of them
    // plus one false positive
    val t = truth((1L, 2L, 0.9), (3L, 4L, 0.6), (5L, 6L, 0.5), (7L, 8L, 0.1))
    val c = cand((1L, 2L), (3L, 4L), (9L, 10L))
    val r = Dedup.lshRecallStats(t, c, 0.5).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 3L, 2L)))
    assert(r.getDouble(3) === 2.0 / 3.0)
    assert(r.getDouble(4) === 2.0 / 3.0)
  }

  test("empty truth and empty candidate sets are zero-guarded to 1.0") {
    val r = Dedup.lshRecallStats(truth(), cand(), 0.5).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((0L, 0L, 0L)))
    assert(r.getDouble(3) === 1.0)
    assert(r.getDouble(4) === 1.0)
  }
}
