package graft

import org.apache.spark.sql.functions._
import graft.llm.Relevance

/** Relevance.kneserNeyBigrams: hand-computed probabilities on a tiny
  * corpus, and the exact-integer mass identities on the real one. */
class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed KN probability and count evidence") {
    val docs = Seq(1L -> "a b", 2L -> "a b", 3L -> "a c", 4L -> "b c")
      .toDF("doc_id", "text")
    val m = Relevance.kneserNeyBigrams(docs).cache()
    // bigram counts: (a,b)=2 (a,c)=1 (b,c)=1; ctx a: total 3, 2
    // followers; continuation: b completes 1 context, c completes 2;
    // B = 3 bigram types
    val ab = m.filter(col("prev_term") === "a" && col("cur_term") === "b")
      .collect().head
    assert(ab.getAs[Long]("big_cnt") === 2L)
    assert(ab.getAs[Long]("ctx_cnt") === 3L)
    assert(ab.getAs[Long]("n_follow") === 2L)
    assert(ab.getAs[Long]("n_prec") === 1L)
    assert(ab.getAs[Long]("n_bigram_types") === 3L)
    // identical IEEE tree, computed here in the same shape
    val expected = (2.0 - 0.5) / 3.0 + ((0.5 * 2.0) / 3.0) * (1.0 / 3.0)
    assert(ab.getAs[Double]("p_kn") === expected)
    // continuation-weighted arm: p_kn(c|b) leans on c's 2 contexts
    val bc = m.filter(col("prev_term") === "b" && col("cur_term") === "c")
      .collect().head
    assert(bc.getAs[Double]("p_kn") ===
      (1.0 - 0.5) / 1.0 + ((0.5 * 1.0) / 1.0) * (2.0 / 3.0))
    m.unpersist()
  }

  test("exact mass identities hold on the real corpus") {
    val m = Relevance.kneserNeyBigrams(Tables.documents(spark, sf)).cache()
    // per context: Σ big_cnt = ctx_cnt and row count = n_follow
    assert(m.groupBy("prev_term", "ctx_cnt", "n_follow")
      .agg(sum("big_cnt").as("s"), count(lit(1)).as("k"))
      .filter(col("s") =!= col("ctx_cnt") || col("k") =!= col("n_follow"))
      .count() === 0)
    // continuation counts partition the type universe:
    // Σ_distinct-cur n_prec = B
    val b = m.select("n_bigram_types").as[Long].head()
    val s = m.select("cur_term", "n_prec").distinct()
      .agg(sum("n_prec")).as[Long].head()
    assert(s === b)
    // discounted mass per context: Σ (2·c − 1) = 2·ctx − nf (the
    // integer twin of Σ (c−D)/ctx = 1 − λ(v))
    assert(m.groupBy("prev_term", "ctx_cnt", "n_follow")
      .agg(sum(col("big_cnt") * 2 - 1).as("s2"))
      .filter(col("s2") =!= col("ctx_cnt") * 2 - col("n_follow"))
      .count() === 0)
    m.unpersist()
  }
}
