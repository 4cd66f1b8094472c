package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.llm.Dedup.{hex60, words}

/** Text analysis for training-data curation over `documents`: token
  * counting, quality scoring, n-gram-heuristic language ID, and a
  * rolling-hash document fingerprint. All expressions are codegen'd
  * Catalyst built-ins or single-pass higher-order folds; the
  * fingerprint fold and every ratio are mirrored exactly in the DuckDB
  * oracle.
  *
  * Fused passes (VERDICT r2 #5): the five stopword-family counters
  * (quality stopwords + 4 language families) fold over the token array
  * ONCE with a 5-field struct accumulator — r2 ran five separate
  * interpreted `filter(...)` passes, each allocating an intermediate
  * array. Digit/punct counts use `regexp_count` (no replaced-string
  * allocation). Same values, same oracle.
  */
object TextStats {

  val Stopwords = Seq("the", "a", "and", "of", "to", "in", "is")
  val FingerprintMod = 1000000007L

  /** THE chars/4 token estimator, defined once: every token-budget
    * decision (text_stats' n_tokens_est, sequence packing, the
    * training-corpus build) and both DuckDB mirrors derive from this
    * pair, so the estimator cannot change in one place and silently
    * desynchronize pack budgets from text stats (review r6). */
  def nTokensEst(nChars: Column): Column =
    ceil(nChars.cast("double") / lit(4.0)).cast("long")
  def nTokensEstSql(nCharsExpr: String): String =
    s"cast(ceil(cast($nCharsExpr as double) / 4.0) as bigint)"

  /** BPE-ish pre-tokenizer regex (GPT-2-style split shape: letter runs,
    * digit runs, punctuation runs — each absorbing one leading space —
    * plus residual whitespace). Deliberately lookahead-free, and the
    * whitespace class is written out instead of \s (Java \s includes
    * \x0B, RE2's does not), so the Java regex engine (Spark) and RE2
    * (DuckDB) count identical matches. */
  val BpeTokenRegex =
    " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\r\\f]+|[ \\t\\n\\r\\f]+"

  private val EnWords = Seq("the", "and", "of")
  private val FrWords = Seq("le", "la", "et")
  private val DeWords = Seq("der", "und", "die")
  private val EsWords = Seq("el", "los", "y")

  private def hit(x: Column, vals: Seq[String]): Column =
    when(vals.map(v => x === v).reduce(_ || _), 1).otherwise(0)

  /** All five token-membership counters in one fold over `w`. */
  private def counters(w: Column): Column =
    aggregate(w,
      struct(lit(0).as("stop"), lit(0).as("en"), lit(0).as("fr"),
        lit(0).as("de"), lit(0).as("es")),
      (acc, x) => struct(
        (acc.getField("stop") + hit(x, Stopwords)).as("stop"),
        (acc.getField("en") + hit(x, EnWords)).as("en"),
        (acc.getField("fr") + hit(x, FrWords)).as("fr"),
        (acc.getField("de") + hit(x, DeWords)).as("de"),
        (acc.getField("es") + hit(x, EsWords)).as("es")))

  def textStats(documentsRaw: DataFrame): DataFrame = {
    // tokenize once BELOW an exchange barrier (see Dedup.tokenized):
    // spreads the few-split scan across cores AND stops project-collapse
    // from re-inlining the split per downstream reference of `w`. The
    // counter struct gets its own projection for the same reason —
    // CollapseProject keeps multi-referenced expensive aliases intact,
    // so `cnt` is folded once per row, not once per consumer.
    val base = documentsRaw
      .select(col("doc_id"), col("text"), col("n_chars"), words(col("text")).as("w"))
      .repartition(col("doc_id"))
    val mid = base.select(col("doc_id"), col("text"), col("n_chars"), col("w"),
      counters(col("w")).as("cnt"))

    val w = col("w")
    val nWords = size(w)
    val stopHits = col("cnt").getField("stop")
    val digitCount = regexp_count(col("text"), lit("[0-9]"))
    val punctCount = regexp_count(col("text"), lit("[.,;:!?]"))
    val stopRatio = when(nWords > 0, stopHits.cast("double") / nWords.cast("double")).otherwise(lit(0.0))
    val digitRatio = when(length(col("text")) > 0,
      digitCount.cast("double") / length(col("text")).cast("double")).otherwise(lit(0.0))
    val punctRatio = when(length(col("text")) > 0,
      punctCount.cast("double") / length(col("text")).cast("double")).otherwise(lit(0.0))

    // language ID by stopword-family hits; argmax with fixed tie order.
    val en = col("cnt").getField("en")
    val fr = col("cnt").getField("fr")
    val de = col("cnt").getField("de")
    val es = col("cnt").getField("es")
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

    mid.select(
      col("doc_id"),
      nWords.cast("long").as("n_words"),
      nTokensEst(col("n_chars")).as("n_tokens_est"),
      regexp_count(col("text"), lit(BpeTokenRegex)).cast("long").as("n_tokens_bpe"),
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

  /** Top 5 documents per predicted language by quality score, via the
    * bounded-heap [[graft.expressions.TopKAggregate]] — the scale-safe
    * grouped top-k: a partial ObjectHashAggregate keeps ≤ k entries per
    * language per map task, so the exchange carries tiny heaps instead
    * of every document row the window-function formulation would
    * shuffle and sort (TopKSpec asserts both the plan shape and
    * row-equality with that window twin). */
  val TopDocsK = 5

  /** Vocabulary size for [[vocabCoverage]]: the top-K corpus terms by
    * total occurrence count (ties broken by term ascending, making the
    * cut deterministic). */
  val VocabK = 256

  /** Per-document out-of-vocabulary rate against the corpus's own
    * top-[[VocabK]] vocabulary — the tokenizer-fit signal a training
    * pipeline checks before committing to a vocab: a document whose
    * tokens mostly fall outside the vocabulary will fragment into
    * byte-fallback pieces and blow up its real token count.
    *
    * Scale (100 TB): term counts are vocabulary-keyed with map-side
    * combine; the top-K cut is a distributed TakeOrdered (K rows to
    * the driver, no global sort); membership is a BROADCAST left join
    * of the K-row vocab against the exploded tokens; per-doc counts
    * shuffle (doc_id) only. Determinism: exact integer counts, one
    * IEEE division at the boundary; the (count desc, term asc) total
    * order makes the vocabulary itself reproducible. */
  def vocabCoverage(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .repartition(col("doc_id"))
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(VocabK)
      .select(col("term"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("in_vocab").isNull, lit(1))).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_frac"))
  }

  /** Confusion matrix of the n-gram language-ID heuristic against the
    * labeled `lang` column — the accuracy artifact any heuristic
    * classifier ships with. One keyed join (the stats side is the Mat
    * barrier) + one grouped count; the matrix is |langs|² rows. */
  def langConfusion(documents: DataFrame, stats: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("lang"))
      .join(stats.select(col("doc_id"), col("predicted_lang")), Seq("doc_id"))
      .groupBy("lang", "predicted_lang")
      .agg(count(lit(1)).as("n_docs"))

  /** VOCABULARY GROWTH CURVE (Heaps' law profile) — how fast the
    * distinct-term count grows as the corpus is consumed in doc_id
    * order, by decile: per decile the doc/token mass, the number of
    * terms FIRST seen there, and the cumulative vocabulary. The
    * corpus-planning read: a flattening curve says more data buys
    * few new types (dedup/crawl-rotation signal); a steep tail says
    * the vocabulary (and any hash-embedding dimensionality) is not
    * yet saturated.
    *
    * Deciles come from the two-phase [[graft.operators.Quantiles.exactBuckets]]
    * (metric −doc_id ≡ ascending ntile — byte-identical to the
    * oracle's window form); first-seen is one min per term (the
    * vocabulary-bounded aggregate every tf pass pays anyway); the
    * cumulative sum is a window over exactly 10 rows. */
  def vocabGrowth(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buckets = graft.operators.Quantiles
      .exactBuckets(documents.select("doc_id"), "doc_id",
        col("doc_id") * -1, 10)
      .select(col("doc_id"), col("bucket"))
    val toks = documents
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .join(buckets, Seq("doc_id"))
    val newTerms = toks.groupBy("term")
      .agg(min("bucket").as("first_bucket"))
      .groupBy("first_bucket").agg(count(lit(1)).as("new_terms"))
    toks.groupBy("bucket")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"))
      .join(newTerms, col("bucket") === col("first_bucket"), "left")
      .select(col("bucket"), col("n_docs"), col("n_tokens"),
        coalesce(col("new_terms"), lit(0L)).as("new_terms"))
      .withColumn("cum_terms", sum("new_terms").over(
        graft.operators.BoundedWindow.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Gopher rule-filter bounds (Rae et al. 2021 §A1.1, public): word
    * count in [Min,Max] words, mean word length in [3,10] chars,
    * symbol-to-word ratio < 0.1 (# and ellipsis), < 90% of lines
    * bullet-led, < 30% ellipsis-terminated, > 80% of words with an
    * alphabetic character, ≥ 2 required-stopword hits. */
  val GopherMinWords = 50L
  val GopherMaxWords = 100000L

  /** The canonical Gopher quality-rule filter over `documents` — the
    * published heuristic battery a web-scale curation pipeline runs
    * before any model-based scoring (complements [[textStats]]'
    * continuous quality_score with hard pass/fail rules).
    *
    * Determinism: EVERY rule is evaluated in pure integer arithmetic —
    * ratio thresholds become cross-multiplied integer comparisons
    * (symbols/words < 1/10 ⇔ 10·symbols < words), so no float ever
    * crosses the oracle gate; the raw counters ship alongside the
    * booleans so the gate checks the arithmetic, not just the verdict.
    *
    * Scale: one pass per document (the [[textStats]] shape): tokenize
    * once below the repartition barrier, fold the counters once,
    * emit. No shuffle beyond the scan-spread repartition; no joins. */
  def gopherRules(documentsRaw: DataFrame): DataFrame = {
    val base = documentsRaw
      .select(col("doc_id"), col("text"), words(col("text")).as("w"),
        filter(split(col("text"), "\n", -1), l => trim(l) =!= "").as("ls"))
      .repartition(col("doc_id"))
    val w = col("w"); val ls = col("ls")
    val mid = base.select(col("doc_id"),
      size(w).cast("long").as("n_words"),
      length(concat_ws("", w)).cast("long").as("n_word_chars"),
      regexp_count(col("text"), lit("#|\\.\\.\\.")).cast("long").as("n_symbols"),
      size(ls).cast("long").as("n_lines"),
      size(filter(ls, l => trim(l).startsWith("- ") ||
        trim(l).startsWith("* ") || trim(l).startsWith("•")))
        .cast("long").as("n_bullet_lines"),
      size(filter(ls, l => trim(l).endsWith("...") ||
        trim(l).endsWith("…"))).cast("long").as("n_ellipsis_lines"),
      size(filter(w, x => x.rlike("[A-Za-z]"))).cast("long").as("n_alpha_words"),
      aggregate(w, lit(0), (acc, x) => acc + hit(x, Stopwords))
        .cast("long").as("n_stop_hits"))
    mid.select(col("doc_id"), col("n_words"), col("n_word_chars"),
      col("n_symbols"), col("n_lines"), col("n_bullet_lines"),
      col("n_ellipsis_lines"), col("n_alpha_words"), col("n_stop_hits"),
      (col("n_words") >= GopherMinWords && col("n_words") <= GopherMaxWords)
        .as("r_word_count"),
      (col("n_word_chars") >= lit(3L) * col("n_words") &&
        col("n_word_chars") <= lit(10L) * col("n_words")).as("r_word_len"),
      (col("n_symbols") * 10L < col("n_words")).as("r_symbol_ratio"),
      (col("n_bullet_lines") * 10L < col("n_lines") * 9L).as("r_bullet_lines"),
      (col("n_ellipsis_lines") * 10L < col("n_lines") * 3L).as("r_ellipsis_lines"),
      (col("n_alpha_words") * 10L > col("n_words") * 8L).as("r_alpha_words"),
      (col("n_stop_hits") >= 2L).as("r_stopwords"))
      .withColumn("keep",
        col("r_word_count") && col("r_word_len") && col("r_symbol_ratio") &&
          col("r_bullet_lines") && col("r_ellipsis_lines") &&
          col("r_alpha_words") && col("r_stopwords"))
  }

  /** Collocation mining config: a bigram must occur at least
    * [[CollocMinCount]] times; the report keeps the top
    * [[CollocTopK]] by lift. */
  val CollocMinCount = 5L
  val CollocTopK = 100

  /** Bigram collocation mining by LIFT — P(xy)/(P(x)·P(y)), the
    * monotone-equivalent core of PMI (PMI = ln lift) ranked without
    * ever taking a log: phrase extraction for tokenizer vocab
    * seeding and boilerplate discovery.
    *
    * Determinism: counts are exact integers; lift is reported in
    * micro-units via ONE fully-IEEE chain — int→double conversions
    * (exact below 2^53), two multiplications, one division, one
    * half-away round — every op correctly rounded in both engines,
    * unlike ln (libm-dependent last-ulp). The (lift desc, w1, w2)
    * total order makes the top-K cut reproducible.
    *
    * Scale: bigram and unigram counts are term-keyed aggregations
    * with map-side combine over the exploded token stream; the join
    * attaches two |vocab|-row count tables (broadcast-scale); the
    * top-K is a distributed TakeOrdered, never a global sort. */
  def collocationLift(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), words(col("text")).as("w"))
      .repartition(col("doc_id"))
    val uni = toks.select(explode(col("w")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    val total = uni.agg(sum("c").as("n_tokens"))
    val bi = toks
      .select(explode(when(size(col("w")) >= 2,
        transform(sequence(lit(1), size(col("w")) - 1),
          i => struct(element_at(col("w"), i).as("w1"),
            element_at(col("w"), i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= CollocMinCount)
    bi.join(uni.select(col("term").as("w1"), col("c").as("c_x")), Seq("w1"))
      .join(uni.select(col("term").as("w2"), col("c").as("c_y")), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        round((col("c_xy").cast("double") * col("n_tokens").cast("double")
          * lit(1000000.0))
          / (col("c_x").cast("double") * col("c_y").cast("double")))
          .cast("long").as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("w1"), col("w2"))
      .limit(CollocTopK)
  }

  /** `stats`: the (Mat'd) [[textStats]] output — passed in so the
    * barrier is shared with every other text_stats consumer. */
  def topDocsPerLang(stats: DataFrame): DataFrame =
    stats
      .groupBy(col("predicted_lang"))
      .agg(graft.expressions.TopKAggregate
        .top_k(col("quality_score"), col("doc_id"), TopDocsK).as("tk"))
      .select(col("predicted_lang"), posexplode(col("tk")))
      .select(
        col("predicted_lang"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.payload").as("doc_id"),
        col("col.score").as("quality_score"))

  /** FLESCH READABILITY (Flesch 1948; Kincaid et al. 1975) over the
    * shared whitespace tokenization: reading-ease and grade-level from
    * exact integer word / sentence / syllable counts. Syllables use
    * the standard vowel-group approximation (runs of [aeiouyAEIOUY],
    * min 1 per word) — a documented heuristic, identical regex on both
    * engines (Java regex and RE2 agree on this character-class-only
    * pattern). Sentences = runs of [.!?], clamped >= 1. The two rates
    * are single divisions of exact ints; the Flesch/FK polynomials are
    * literal-coefficient chains in the same left-associative order on
    * both engines (coefficients embedded via the dlit contract). */
  def readability(documentsRaw: DataFrame): DataFrame = {
    val base = documentsRaw
      .select(col("doc_id"), col("text"), words(col("text")).as("w"))
      .withColumn("n_words", size(col("w")).cast("long"))
      .where(col("n_words") > 0)
      .withColumn("n_sentences",
        greatest(lit(1L),
          size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))).cast("long")))
      .withColumn("n_syllables",
        expr("""aggregate(w, cast(0 as bigint), (acc, x) ->
          acc + greatest(cast(1 as bigint),
            cast(size(regexp_extract_all(x, '[aeiouyAEIOUY]+', 0)) as bigint)))"""))
    base.select(
      col("doc_id"), col("n_words"), col("n_sentences"), col("n_syllables"),
      (col("n_words").cast("double") / col("n_sentences").cast("double"))
        .as("words_per_sentence"),
      (col("n_syllables").cast("double") / col("n_words").cast("double"))
        .as("syllables_per_word"))
      .withColumn("flesch",
        lit(206.835)
          - lit(1.015) * col("words_per_sentence")
          - lit(84.6) * col("syllables_per_word"))
      .withColumn("fk_grade",
        lit(0.39) * col("words_per_sentence")
          + lit(11.8) * col("syllables_per_word")
          - lit(15.59))
  }
}
