package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.{HashEmbed, Prf, Relevance}

/** Prf.prfSearch: the pseudo-relevance-feedback rescue property on a
  * hand-built corpus (a doc sharing vocabulary only with the RESULTS
  * becomes reachable in round 2), expansion hygiene, and structural
  * contracts on the real table (exact cross-engine math is gated by
  * the DuckDB oracle). */
class PrfSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  private def prf(docs: DataFrame): DataFrame =
    Prf.prfSearch(Relevance.tfidfTopTerms(docs),
      HashEmbed.impactPostings(HashEmbed.postings(docs),
        HashEmbed.corpusStats(docs)))

  // query doc 3 (3 % 29 = 3) says "alpha beta"; only doc 10 shares
  // those terms and is dominated by "gamma"; doc 11 has NO original
  // query term but is all about gamma — round 1 can't see it, the
  // expanded round 2 can. Fillers keep idf meaningful.
  private lazy val fixture = corpus(
    3L -> "alpha beta",
    10L -> "alpha beta gamma gamma gamma",
    11L -> "gamma gamma gamma delta",
    20L -> "zeta eta zeta",
    21L -> "theta iota theta",
    22L -> "kappa lambda mu")

  test("expansion reaches a doc round 1 cannot see, and reports it") {
    val docs = fixture
    val out = prf(docs).filter(col("query_doc_id") === 3L).cache()
    // round 1 alone (the capped lexical list) never surfaces doc 11
    val qt = Relevance.tfidfTopTerms(docs)
      .filter(col("doc_id") === 3L)
      .select(col("doc_id").as("query_doc_id"), col("term"), col("rank"))
    val r1 = HashEmbed.lexTopList(qt,
      HashEmbed.impactPostings(HashEmbed.postings(docs),
        HashEmbed.corpusStats(docs)))
    assert(r1.filter(col("doc_id") === 11L).count() === 0)
    // ...but the PRF round 2 does, via the mined gamma term
    assert(out.filter(col("doc_id") === 11L).count() === 1)
    // exactly one expansion term fired (gamma; alpha/beta excluded as
    // original query terms)
    assert(out.select("n_exp_terms").distinct().as[Long].collect()
      .toSeq === Seq(1L))
    // the full-match doc outranks the expansion-only doc: base terms
    // carry weight 1, expansion 0.5
    val ranks = out.select("doc_id", "rank").as[(Long, Int)].collect().toMap
    assert(ranks(10L) < ranks(11L))
    out.unpersist()
  }

  test("structural contracts on the real corpus + determinism") {
    val docs = Tables.documents(spark, sf)
    val out = prf(docs).cache()
    assert(out.filter(col("query_doc_id") % 29 =!= 3).count() === 0)
    assert(out.filter(col("doc_id") === col("query_doc_id")).count() === 0)
    assert(out.filter(!col("rank").between(1, HashEmbed.TopK)).count() === 0)
    assert(out.filter(!col("n_exp_terms").between(0, Prf.ExpTerms))
      .count() === 0)
    // prf_score non-increasing down each query's ranking
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_doc_id").orderBy("rank")
    assert(out.withColumn("prev", lag(col("prf_score"), 1).over(w))
      .filter(col("prev").isNotNull && col("prf_score") > col("prev"))
      .count() === 0)
    val again = prf(docs)
    assert(out.exceptAll(again).count() === 0 &&
      again.exceptAll(out).count() === 0)
    out.unpersist()
  }
}
