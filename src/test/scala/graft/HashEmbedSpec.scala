package graft

import org.apache.spark.sql.functions._
import graft.llm.HashEmbed

/** Structural invariants of the feature-hashed embeddings and the
  * hybrid RRF retrieval (the exact cross-engine math is gated by the
  * DuckDB oracle; these pin properties a value-hash diff can't name). */
class HashEmbedSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("hashedEmbeddings: bucket sums conserve token counts and sign parity") {
    val he = HashEmbed.hashedEmbeddings(docs).cache()
    assert(he.filter(col("bucket") < 0 || col("bucket") >= HashEmbed.Dim).count() === 0)
    // every token lands in exactly one bucket: per-doc Σ n_terms = |w|
    val tokCounts = docs.select(col("doc_id"),
      size(graft.llm.Dedup.words(col("text"))).cast("long").as("n_tok"))
    val bucketTotals = he.groupBy("doc_id").agg(sum("n_terms").as("n_sum"))
    assert(tokCounts.join(bucketTotals, Seq("doc_id"))
      .filter(col("n_tok") =!= col("n_sum")).count() === 0)
    // v is a ±1 sum over n_terms tokens: |v| ≤ n_terms and v ≡ n_terms (mod 2)
    assert(he.filter(abs(col("v")) > col("n_terms") ||
      pmod(col("v") - col("n_terms"), lit(2L)) =!= 0).count() === 0)
    he.unpersist()
  }

  test("hybridSearch: rank contracts hold and fusion is deterministic") {
    val h = HashEmbed.hybridSearch(docs).cache()
    // every emitted row belongs to a registered query doc, never self
    assert(h.filter(col("query_doc_id") % 29 =!= 3).count() === 0)
    assert(h.filter(col("doc_id") === col("query_doc_id")).count() === 0)
    // ranks dense in 1..HybridTopK per query; source ranks in 1..TopK
    assert(h.filter(!col("rank").between(1, HashEmbed.HybridTopK)).count() === 0)
    assert(h.filter(col("lex_rank").isNotNull &&
      !col("lex_rank").between(1, HashEmbed.TopK)).count() === 0)
    assert(h.filter(col("sem_rank").isNotNull &&
      !col("sem_rank").between(1, HashEmbed.TopK)).count() === 0)
    // a row with no source rank at all cannot exist (fusion is a full
    // outer join of the two lists)
    assert(h.filter(col("lex_rank").isNull && col("sem_rank").isNull).count() === 0)
    // rrf_score non-increasing down each query's ranking
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_doc_id").orderBy("rank")
    assert(h.withColumn("prev", lag(col("rrf_score"), 1).over(w))
      .filter(col("prev").isNotNull && col("rrf_score") > col("prev"))
      .count() === 0)
    // deterministic end to end
    val again = HashEmbed.hybridSearch(docs)
    assert(h.exceptAll(again).count() === 0 && again.exceptAll(h).count() === 0)
    h.unpersist()
  }

  test("a doc topping BOTH lists tops the fused ranking (RRF dominance)") {
    val h = HashEmbed.hybridSearch(docs)
    val doubleTop = h.filter(col("lex_rank") === 1 && col("sem_rank") === 1)
    val notFirst = doubleTop.filter(col("rank") =!= 1).count()
    assert(notFirst === 0)
  }
}
