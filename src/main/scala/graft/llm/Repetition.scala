package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Intra-document repetition scoring — the quality signal that catches
  * degenerate text (boilerplate loops, template spam, decoder
  * repetition) which length/stopword ratios miss: a document whose
  * word-3-grams are mostly copies of each other is repetitive even
  * when every individual word looks fine.
  *
  * Metrics per document over its word 3-grams (multiplicity kept):
  * total grams, distinct grams, the highest single-gram repeat count,
  * and `dup_ratio = 1 - distinct/total` (0 = no repetition).
  *
  * At 100 TB: reuses the shared shingle explosion (one tokenization
  * pass feeds dedup, decontamination AND this), and aggregates on the
  * 60-bit gram HASH — the shuffle key is 8 bytes, never the raw gram
  * text (the same convention as the whole dedup family) — with
  * map-side partial combine; a second partial-combined aggregate then
  * collapses to one row per document. Short documents (< 3 words, no
  * grams) surface with zero counts via the left join from the corpus,
  * not silently dropped.
  */
object Repetition {

  /** `docShingles`: exploded (doc_id, sh) WITH multiplicity —
    * [[Dedup.docShingles]]. */
  def repetitionStats(documents: DataFrame, docShingles: DataFrame): DataFrame = {
    val perGram = docShingles
      .select(col("doc_id"), Dedup.hex60(col("sh")).as("shk"))
      .groupBy("doc_id", "shk")
      .agg(count(lit(1)).as("c"))
    val perDoc = perGram.groupBy("doc_id").agg(
      sum("c").as("n_grams"),
      count(lit(1)).as("n_distinct"),
      max("c").as("max_repeat"))
    documents.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("max_repeat"), lit(0L)).as("max_repeat"),
        when(col("n_grams").isNotNull,
          lit(1.0) - col("n_distinct").cast("double") / col("n_grams").cast("double"))
          .otherwise(lit(0.0)).as("dup_ratio"))
  }
}
