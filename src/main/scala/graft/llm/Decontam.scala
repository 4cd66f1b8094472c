package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share
  * n-grams with an evaluation/benchmark set, the standard check run
  * before any corpus is used for training (test-set contamination
  * inflates every downstream eval).
  *
  * Mechanics: both sides are reduced to hashed word-3-gram keys (the
  * SAME shared shingle-key table the Jaccard dedup path uses — one
  * corpus tokenization pass feeds dedup AND decontamination); a
  * candidate document's contamination score is how many DISTINCT
  * benchmark shingles it contains.
  *
  * At 100 TB: the benchmark side is small by definition (eval suites
  * are thousands of documents, not billions), so its distinct shingle
  * keys broadcast — the corpus-side scan streams past an 8-byte-key
  * hash set with NO shuffle of the corpus; only matching (doc_id, key)
  * pairs reach the per-document count, and the final left join back to
  * the corpus is on doc_id. Nothing is quadratic and nothing ships
  * raw text.
  */
object Decontam {

  /** Benchmark membership for the registered query: doc_id ≡ 0
    * (mod 20) — a deterministic 5% "benchmark" carved from the corpus
    * (the driver testdata has no separate eval table; in production
    * this is an external benchmark corpus run through the same
    * shingle pipeline). */
  val BenchmarkMod = 20L

  /** A candidate is contaminated when it contains at least this many
    * distinct benchmark shingles. 1 = strict (any verbatim 3-gram
    * overlap flags); real pipelines tune upward for boilerplate. */
  val MinHits = 1L

  /** `docShingleKeys`: distinct (doc_id, shk) — [[Dedup.docShingleKeys]].
    * Output: every NON-benchmark document with its distinct benchmark-
    * shingle hit count and the contaminated flag. */
  def contamination(documents: DataFrame, docShingleKeys: DataFrame): DataFrame = {
    val isBench = col("doc_id") % BenchmarkMod === 0
    val benchKeys = docShingleKeys.filter(isBench).select("shk").distinct()
    val candKeys = docShingleKeys.filter(!isBench)
    val hits = candKeys
      .join(broadcast(benchKeys), "shk")
      .groupBy("doc_id")
      // docShingleKeys is distinct per (doc_id, shk): count(*) IS the
      // distinct overlapping-shingle count — no count_distinct state
      .agg(count(lit(1)).as("n_benchmark_hits"))
    documents.filter(!isBench).select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_benchmark_hits"), lit(0L)).as("n_benchmark_hits"),
        (coalesce(col("n_benchmark_hits"), lit(0L)) >= MinHits)
          .as("contaminated"))
  }
}
