package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.TopKAggregate.top_k

/** PSEUDO-RELEVANCE-FEEDBACK query expansion (Rocchio 1971; the RM3
  * blind-feedback family) over the impact-postings index — the second
  * round-trip a production search stack makes when recall matters:
  * run the query, treat the top [[FbDocs]] results as relevant, mine
  * their strongest terms, and re-run with the expanded query at a
  * discounted weight, so documents sharing VOCABULARY WITH THE
  * RESULTS (not just with the query) become reachable.
  *
  * Expansion-term mining reads the materialized per-document tf-idf
  * keyword table ([[Relevance.tfidfTopTerms]], the `tfidf_top_terms`
  * Mat) instead of re-scoring feedback-doc text per request — at
  * serving time a feedback doc's keywords are a keyed LOOKUP, the
  * same build-once/probe-often shape as the impact postings
  * themselves. Candidate expansion terms rank by the feedback
  * evidence `(lex_rank, tfidf rank)` lexicographically (encoded
  * injectively as `lex_rank·(TfidfTopK+1) + t_rank`, both bounded),
  * tie-broken by term; original query terms are excluded; the top
  * [[ExpTerms]] join the query at ranks TfidfTopK+1.. with weight
  * [[ExpWeight]].
  *
  * Determinism: both scoring rounds add their per-term BM25 scores in
  * FIXED rank order (the literal-pivot device of
  * [[HashEmbed.lexTopList]]); the expansion discount is one IEEE
  * multiply by the POWER-OF-TWO 1/2 (exact); every rank totalizes by
  * doc_id/term. The second round scores `c1+c2+c3+0.5·c4+0.5·c5+0.5·c6`
  * left-to-right — the oracle spells the identical fold.
  *
  * Scale (100 TB): round 1 probes ≤ TfidfTopK capped posting lists per
  * query; expansion is a broadcast keyed lookup of FbDocs·TfidfTopK
  * rows per query; round 2 probes ≤ TfidfTopK+ExpTerms capped lists.
  * Per-request cost is bounded by (terms × ImpactCap) postings — the
  * corpus is never scanned, and no stage grows with corpus size
  * except the one-time index build it shares with hybrid_search. */
object Prf {

  /** Feedback depth: round-1 results treated as pseudo-relevant. */
  val FbDocs = 3
  /** Expansion terms appended to the query. */
  val ExpTerms = 3
  /** Expansion-term weight — a power of two, so the discount multiply
    * is exact in IEEE arithmetic on both engines. */
  val ExpWeight = 0.5

  import HashEmbed.{querySel, QueryIdBound, TopK, ImpactCap}
  import Relevance.TfidfTopK

  /** The registered query: PRF-expanded BM25 retrieval, top-[[TopK]]
    * per query with the expanded-query score and the number of
    * expansion terms that fired (0 where round 1 came back empty). */
  def prfSearch(topTerms: DataFrame, impact: DataFrame,
                bound: Long = QueryIdBound): DataFrame = {
    val qt = topTerms
      .filter(querySel(col("doc_id"), bound))
      .select(col("doc_id").as("query_doc_id"), col("term"), col("rank"))
    // round 1: the plain lexical serving list, feedback prefix only
    val feedback = HashEmbed.lexTopList(qt, impact, depth = FbDocs)
    // mine expansion terms from the feedback docs' keyword Mat
    val cand = feedback
      .join(topTerms.select(col("doc_id"), col("term"),
        col("rank").as("t_rank")), Seq("doc_id"))
      .join(qt.select("query_doc_id", "term"),
        Seq("query_doc_id", "term"), "left_anti")
      .groupBy("query_doc_id", "term")
      .agg(min(col("lex_rank").cast("long") * (TfidfTopK + 1) + col("t_rank"))
        .as("ord"))
    val exp = cand
      .withColumn("e_rank", row_number().over(
        Window.partitionBy("query_doc_id").orderBy(col("ord"), col("term"))))
      .filter(col("e_rank") <= ExpTerms)
      .select(col("query_doc_id"), col("term"),
        (col("e_rank") + TfidfTopK).as("rank"))
    val nExp = exp.groupBy("query_doc_id")
      .agg(count(lit(1)).as("n_exp_terms"))
    val qt2 = qt.select("query_doc_id", "term", "rank")
      .unionByName(exp.select("query_doc_id", "term", "rank"))
    // round 2: weighted fixed-rank-order pivot over the capped index
    val nR = TfidfTopK + ExpTerms
    val scored = impact.filter(col("impact_rank") <= ImpactCap)
      .join(broadcast(qt2), Seq("term"))
      .filter(col("doc_id") =!= col("query_doc_id"))
    val perRank = (1 to nR).map(r =>
      max(when(col("rank") === r, col("s"))).as(s"s_r$r"))
    val terms = (1 to TfidfTopK).map(r => coalesce(col(s"s_r$r"), lit(0.0))) ++
      (TfidfTopK + 1 to nR).map(r =>
        lit(ExpWeight) * coalesce(col(s"s_r$r"), lit(0.0)))
    scored.groupBy("query_doc_id", "doc_id")
      .agg(perRank.head, perRank.tail: _*)
      .withColumn("prf_score", terms.reduceLeft(_ + _))
      .groupBy("query_doc_id")
      .agg(top_k(col("prf_score"), col("doc_id"), TopK).as("tk"))
      .select(col("query_doc_id"), posexplode(col("tk")))
      .select(col("query_doc_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.payload").as("doc_id"), col("col.score").as("prf_score"))
      .join(nExp, Seq("query_doc_id"), "left")
      .withColumn("n_exp_terms", coalesce(col("n_exp_terms"), lit(0L)))
  }
}
