package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.llm.Dedup.{hex60, words}

/** Text analysis for training-data curation over `documents`: token
  * counting, quality scoring, n-gram-heuristic language ID, and a
  * rolling-hash document fingerprint. All expressions are codegen'd
  * Catalyst built-ins; the fingerprint fold and every ratio are
  * mirrored exactly in the DuckDB oracle.
  */
object TextStats {

  val Stopwords = Seq("the", "a", "and", "of", "to", "in", "is")
  val FingerprintMod = 1000000007L

  private def countMatches(w: Column, vals: Seq[String]): Column =
    size(filter(w, x => vals.map(v => x === v).reduce(_ || _)))

  def textStats(documentsRaw: DataFrame): DataFrame = {
    // tokenize once BELOW an exchange barrier (see Dedup.tokenized):
    // spreads the few-split scan across cores AND stops project-collapse
    // from re-inlining the split per downstream reference of `w`.
    val documents = documentsRaw
      .select(col("doc_id"), col("text"), col("n_chars"), words(col("text")).as("w"))
      .repartition(col("doc_id"))
    val w = col("w")
    val nWords = size(w)
    val stopHits = countMatches(w, Stopwords)
    val digitCount = length(col("text")) - length(regexp_replace(col("text"), "[0-9]", ""))
    val punctCount = length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", ""))
    val stopRatio = when(nWords > 0, stopHits.cast("double") / nWords.cast("double")).otherwise(lit(0.0))
    val digitRatio = when(length(col("text")) > 0,
      digitCount.cast("double") / length(col("text")).cast("double")).otherwise(lit(0.0))
    val punctRatio = when(length(col("text")) > 0,
      punctCount.cast("double") / length(col("text")).cast("double")).otherwise(lit(0.0))

    // language ID by stopword-family hits; argmax with fixed tie order.
    val en = countMatches(w, Seq("the", "and", "of"))
    val fr = countMatches(w, Seq("le", "la", "et"))
    val de = countMatches(w, Seq("der", "und", "die"))
    val es = countMatches(w, Seq("el", "los", "y"))
    val lang = when(en >= fr && en >= de && en >= es && en > 0, "en")
      .when(fr >= de && fr >= es && fr > 0, "fr")
      .when(de >= es && de > 0, "de")
      .when(es > 0, "es")
      .otherwise("other")

    // rolling polynomial hash over word hashes mod p (sequential fold —
    // DuckDB list_reduce reproduces it; acc stays < p so acc*31+h fits
    // a long).
    val fingerprint = when(nWords > 0,
      aggregate(transform(w, x => hex60(x) % FingerprintMod),
        lit(0L), (acc, h) => (acc * 31 + h) % FingerprintMod))
      .otherwise(lit(0L))

    documents.select(
      col("doc_id"),
      nWords.cast("long").as("n_words"),
      ceil(col("n_chars").cast("double") / lit(4.0)).cast("long").as("n_tokens_est"),
      when(nWords > 0,
        length(concat_ws("", w)).cast("double") / nWords.cast("double"))
        .otherwise(lit(0.0)).as("avg_word_len"),
      stopRatio.as("stopword_ratio"),
      digitRatio.as("digit_ratio"),
      punctRatio.as("punct_ratio"),
      (lit(0.3) * least(lit(1.0), nWords.cast("double") / lit(100.0))
        + lit(0.4) * stopRatio
        + lit(0.3) * (lit(1.0) - digitRatio)).as("quality_score"),
      lang.as("predicted_lang"),
      fingerprint.as("fingerprint"))
  }
}
