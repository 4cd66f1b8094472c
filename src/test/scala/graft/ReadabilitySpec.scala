package graft

import graft.llm.TextStats

/** TextStats.readability: hand-counted words/sentences/vowel-group
  * syllables on a fixture, the min-1-syllable clamp, and the Flesch
  * polynomial at a known point. */
class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  test("counts match hand counts and the clamp applies") {
    // "Dry gym myths." — 3 words; vowel-groups: dry->1(y), gym->1(y),
    // myths->1(y); one sentence run
    // "See the sea. Go now!" — 5 words; see->2? no: 'ee' is ONE group
    val docs = Seq(
      (1L, "Dry gym myths."),
      (2L, "See the sea. Go now!"),
      (3L, "xxxx zzz")) // zero vowels: clamp to 1 per word
      .toDF("doc_id", "text")
    val rows = TextStats.readability(docs)
      .select("doc_id", "n_words", "n_sentences", "n_syllables")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rows === Seq(
      (1L, 3L, 1L, 3L),
      (2L, 5L, 2L, 5L), // see(1: ee) the(1) sea(1: ea) go(1) now(1: o+w? 'o' one group, w not a vowel)
      (3L, 2L, 1L, 2L)))
  }

  test("flesch polynomial evaluates the textbook formula") {
    val docs = Seq((1L, "See the sea. Go now!")).toDF("doc_id", "text")
    val (wps, spw, flesch, fk) = TextStats.readability(docs)
      .select("words_per_sentence", "syllables_per_word", "flesch", "fk_grade")
      .as[(Double, Double, Double, Double)].head()
    assert(wps === 2.5)
    assert(spw === 1.0)
    assert(flesch === 206.835 - 1.015 * 2.5 - 84.6 * 1.0)
    assert(fk === 0.39 * 2.5 + 11.8 * 1.0 - 15.59)
  }

  test("empty-token documents are excluded, gated docs all score") {
    val out = TextStats.readability(Tables.documents(spark, sf))
    assert(out.where($"n_words" <= 0).count() === 0)
    assert(out.count() > 0)
  }
}
