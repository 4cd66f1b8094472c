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
    val served = impact.filter(col("impact_rank") <= ImpactCap)
    // ONE base scoring pass (r19, guide §2.4 — reuse the first-pass
    // exchange): the per-(query, doc) rank pivot and fixed-order base
    // sum feed BOTH round 1's feedback selection and round 2's
    // expanded total. Previously round 2 re-joined the whole posting
    // probe against qt ∪ exp and re-aggregated all six pivot columns —
    // the identical `base` subtree below appears twice in the final
    // plan, so its aggregation exchange executes once (ReusedExchange).
    // base_score = ((c1+c2)+c3) is the exact left prefix of the old
    // ((((c1+c2)+c3)+0.5c4)+0.5c5)+0.5c6 fold, so scores stay
    // bit-identical; qt ranks (1..TfidfTopK) and expansion ranks
    // (TfidfTopK+1..) cannot collide, so the split pivot partitions
    // the old one exactly.
    val perRankBase = (1 to TfidfTopK).map(r =>
      max(when(col("rank") === r, col("s"))).as(s"s_r$r"))
    val base = served
      .join(broadcast(qt), Seq("term"))
      .filter(col("doc_id") =!= col("query_doc_id"))
      .groupBy("query_doc_id", "doc_id")
      .agg(perRankBase.head, perRankBase.tail: _*)
      .withColumn("base_score",
        (1 to TfidfTopK)
          .map(r => coalesce(col(s"s_r$r"), lit(0.0))).reduceLeft(_ + _))
      .select("query_doc_id", "doc_id", "base_score")
      // EAGER checkpoint, not plan sharing: the feedback and merge
      // consumers' subtrees canonicalize differently after optimization
      // (measured: two distinct shuffle stages at sf0.1, and the
      // un-checkpointed form ran 2.5× SLOWER than the old two-pass plan
      // at the 8× probe because base computed twice). The checkpoint is
      // bounded — ≤ queries × (TfidfTopK·ImpactCap) candidate rows by
      // the posting caps — and makes the probe run once at every scale.
      .localCheckpoint(true)
      // fresh attribute ids: the checkpoint's output ids still alias the
      // posting scan's, and the full-outer merge against expScored (same
      // scan lineage) trips the analyzer's conflicting-reference check
      .toDF("query_doc_id", "doc_id", "base_score")
    // round 1: feedback prefix = the top FbDocs of the base scores
    // (exactly what HashEmbed.lexTopList(depth=FbDocs) derived from
    // its own scan of the same probe)
    val feedback = base
      .groupBy("query_doc_id")
      .agg(top_k(col("base_score"), col("doc_id"), FbDocs).as("tk"))
      .select(col("query_doc_id"), posexplode(col("tk")))
      .select(col("query_doc_id"), col("col.payload").as("doc_id"),
        (col("pos") + 1).cast("int").as("lex_rank"))
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
    // round 2: only the EXPANSION terms (≤ ExpTerms per query) probe
    // the index again; their pivot merges with the stored base by a
    // full-outer keyed join instead of a second full re-score
    val nR = TfidfTopK + ExpTerms
    val perRankExp = (TfidfTopK + 1 to nR).map(r =>
      max(when(col("rank") === r, col("s"))).as(s"s_r$r"))
    val expScored = served
      .join(broadcast(exp), Seq("term"))
      .filter(col("doc_id") =!= col("query_doc_id"))
      .groupBy("query_doc_id", "doc_id")
      .agg(perRankExp.head, perRankExp.tail: _*)
    val terms = Seq(coalesce(col("base_score"), lit(0.0))) ++
      (TfidfTopK + 1 to nR).map(r =>
        lit(ExpWeight) * coalesce(col(s"s_r$r"), lit(0.0)))
    base.join(expScored, Seq("query_doc_id", "doc_id"), "full_outer")
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
