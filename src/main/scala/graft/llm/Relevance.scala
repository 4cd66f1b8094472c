package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance scoring over the documents table — the lexical
  * ranking primitive behind corpus search and query-targeted quality
  * filtering (e.g. "keep documents relevant to these seed terms").
  *
  * Okapi BM25 with the standard k1/b and the +1 idf smoothing
  * (Robertson/Sparck Jones; the Lucene variant):
  *   idf(t)  = ln( (N - df + 0.5) / (df + 0.5) + 1 )
  *   s(t, d) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
  *
  * Scale design (100 TB): terms are filtered to the query set BEFORE
  * the explode aggregates — the shuffled tf table has at most
  * |query| rows per document; corpus stats (N, total length) are one
  * broadcast row; document frequencies are |query| rows. Nothing
  * scales with vocabulary size.
  *
  * Determinism: every aggregate is exact integer arithmetic; doubles
  * appear only in the final per-term formula, and the per-document
  * total adds the per-term scores in FIXED query order (coalesced
  * conditional aggregates, not a sum over an unordered group — a
  * `sum(score)` fold over shuffle partitions would be
  * partition-order-dependent in the last ulp). The one
  * non-correctly-rounded operation, `ln`, differs between libm
  * implementations in the last ulp, so idf is QUANTIZED to 9 decimal
  * places through a decimal cast on both engines; every other
  * operation is IEEE correctly-rounded in identical order, making the
  * downstream scores bit-exact.
  */
object Relevance {

  val K1 = 1.2
  val B = 0.75
  val QueryTerms: Seq[String] = Seq("data", "join", "stream")

  def bm25(documents: DataFrame): DataFrame = {
    val docs = documents
      .select(col("doc_id"), Dedup.words(col("text")).as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).cast("long").as("dl"))
      .repartition(col("doc_id"))
    val corpus = docs.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
      .filter(col("term").isin(QueryTerms: _*))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), Seq("term")).crossJoin(broadcast(corpus))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
          .cast(org.apache.spark.sql.types.DecimalType(18, 9)).cast("double"))
      .withColumn("avgdl",
        col("total_len").cast("double") / col("n_docs").cast("double"))
      .withColumn("s",
        col("idf") * col("tf") * (K1 + 1) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl").cast("double") / col("avgdl"))))
    val perTerm: Seq[Column] = QueryTerms.map(t =>
      max(when(col("term") === t, col("s"))).as(s"s_$t"))
    scored.groupBy("doc_id")
      .agg(perTerm.head, perTerm.tail: _*)
      .select(col("doc_id") +: QueryTerms.map(t =>
        coalesce(col(s"s_$t"), lit(0.0)).as(s"s_$t")): _*)
      // fixed left-to-right addition — both engines fold identically
      .withColumn("bm25_score",
        QueryTerms.map(t => col(s"s_$t")).reduceLeft(_ + _))
  }

  /** Bigram LM surprisal per document — average −ln p(wᵢ | wᵢ₋₁) in
    * nats against the corpus's own maximum-likelihood bigram model,
    * the step up from [[unigramSurprisal]] every LM-based quality
    * filter takes once unigram stats stop separating fluent text from
    * shuffled-word soup: a document can match the unigram distribution
    * perfectly while its word ORDER is noise, and only a conditional
    * model sees that. Scoring the training corpus against itself means
    * every scored bigram was observed at least once, so the MLE model
    * needs no smoothing (p > 0 by construction; a held-out scorer
    * would interpolate — documented, out of scope here).
    *
    *   p(cur | prev) = count(prev cur) / count(prev ·)
    *
    * where count(prev ·) sums the bigram table over the context — the
    * occurrences of `prev` as a non-final token.
    *
    * Determinism: the [[unigramSurprisal]] recipe verbatim — −ln p
    * quantized to decimal(18,9) per bigram TYPE, exact decimal
    * tf-weighted sum per document (partition-order independent), one
    * IEEE division at the output boundary.
    *
    * Scale (100 TB): shuffled state is (doc_id, bigram, tf) — linear
    * in corpus tokens; the bigram-count table is keyed by distinct
    * bigrams, the context table by distinct unigrams; nothing is
    * pairwise and nothing collects. Documents under 2 tokens have no
    * bigrams and drop out (mirrored by the oracle). */
  def bigramSurprisal(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), Dedup.words(col("text")).as("w"))
      .repartition(col("doc_id"))
    // bigram as a single "prev cur" string key: words are \s+-split so
    // contain no spaces — the first token of the key IS the context.
    val bigrams = toks.select(col("doc_id"),
      explode(when(size(col("w")) >= 2,
          transform(sequence(lit(1), size(col("w")) - 1), i =>
            concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1))))
        .otherwise(array().cast("array<string>"))).as("bg"))
    val tf = bigrams.groupBy("doc_id", "bg").agg(count(lit(1)).as("tf"))
    val bgCnt = tf.groupBy("bg").agg(sum(col("tf")).as("big_cnt"))
    val ctxCnt = bgCnt
      .groupBy(substring_index(col("bg"), " ", 1).as("pv"))
      .agg(sum(col("big_cnt")).as("ctx_cnt"))
    tf.join(bgCnt, Seq("bg"))
      .join(ctxCnt, substring_index(col("bg"), " ", 1) === col("pv"))
      .withColumn("nll",
        log(col("ctx_cnt").cast("double") / col("big_cnt").cast("double"))
          .cast(org.apache.spark.sql.types.DecimalType(18, 9)))
      .groupBy("doc_id")
      // tf narrowed to decimal(10,0) before the multiply — the
      // unigramSurprisal precision trap: (18,9)×long would overflow
      // precision 38 and silently round to scale 8.
      .agg(sum(col("nll") * col("tf")
          .cast(org.apache.spark.sql.types.DecimalType(10, 0))).as("nll_sum"),
        sum(col("tf")).as("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("nll_sum").cast("string").cast("double")
          / col("n_bigrams").cast("double")).as("avg_bigram_nll"))
  }

  val TfidfTopK = 3

  /** Unigram LM surprisal per document — average −ln p(w) in nats
    * against the corpus's own unigram distribution, the classic
    * LM-based quality-filter signal (CCNet-style: documents far from
    * the corpus distribution score high and get culled or bucketed).
    * Perplexity would be exp(avg_nll); exp is deliberately NOT applied
    * — it differs across libms in the last ulp and adds nothing to a
    * monotone ranking signal.
    *
    * Determinism: −ln p is quantized to decimal(18,9) per TERM (the
    * bm25 idf recipe), the per-document total is an EXACT decimal sum
    * (partition-order independent), presented through the shared
    * string→double route, then ONE IEEE division by the token count.
    *
    * Scale (100 TB): the shuffled state is (doc_id, term, tf) — linear
    * in corpus tokens; term counts are vocabulary-keyed; the corpus
    * total is one broadcast row. */
  def unigramSurprisal(documents: DataFrame): DataFrame = {
    val tf = documents
      .select(col("doc_id"), explode(Dedup.words(col("text"))).as("term"))
      .repartition(col("doc_id"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val counts = tf.groupBy("term").agg(sum(col("tf")).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("corpus_tokens"))
    tf.join(counts, Seq("term")).crossJoin(broadcast(total))
      .withColumn("nll",
        log(col("corpus_tokens").cast("double") / col("cnt").cast("double"))
          .cast(org.apache.spark.sql.types.DecimalType(18, 9)))
      .groupBy("doc_id")
      // tf is cast to a NARROW decimal(10,0) before the multiply:
      // decimal(18,9) × long would promote to precision 39 > 38 and
      // Spark silently drops the product to scale 8, rounding each
      // term by up to 5e-9 (caught by the oracle gate); (18,9)×(10,0)
      // stays within 38 digits and the product is exact at scale 9,
      // matching DuckDB's exact decimal×bigint.
      .agg(sum(col("nll") * col("tf")
          .cast(org.apache.spark.sql.types.DecimalType(10, 0))).as("nll_sum"),
        sum(col("tf")).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        (col("nll_sum").cast("string").cast("double")
          / col("n_tokens").cast("double")).as("avg_nll"))
  }

  /** HELD-OUT surprisal — the LM-evaluation twin of
    * [[unigramSurprisal]], and the honest way to score a language
    * model: a Laplace-smoothed unigram model estimated ONLY on the
    * train split scores ONLY the validation split (the deterministic
    * salted-bucket assignment of [[Splits.assign]] — no leakage by
    * construction), so memorization cannot masquerade as quality.
    * p(term) = (cnt+1) / (T + V + 1) with T train tokens and V train
    * vocabulary; an unseen term costs ln(T+V+1) — the smoothing floor
    * — and each doc also reports its OOV token count (the coverage
    * signal vocab pruning decisions read).
    *
    * Determinism: counts/totals are exact integers; each term's nll
    * is the quantized-ln recipe; the per-doc sum multiplies
    * decimal(18,9) × narrow decimal(10,0) (exact — see
    * [[unigramSurprisal]]'s promotion note) and the average is one
    * IEEE division. Scale shape identical to unigramSurprisal: tf
    * shuffles on (doc, term) with map-side combine, the model is one
    * vocabulary-bounded aggregate + a broadcast stats row. */
  def heldoutSurprisal(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val withSplit = documents.join(
      Splits.assign(documents).select("doc_id", "split"), Seq("doc_id"))
    val tfAll = withSplit
      .select(col("doc_id"), col("split"),
        explode(Dedup.words(col("text"))).as("term"))
      .repartition(col("doc_id"))
      .groupBy("doc_id", "split", "term").agg(count(lit(1)).as("tf"))
    val trainCnt = tfAll.filter(col("split") === "train")
      .groupBy("term").agg(sum("tf").as("cnt"))
    val stats = trainCnt.agg(sum("cnt").as("train_tokens"),
      count(lit(1)).as("train_vocab"))
    tfAll.filter(col("split") === "validation")
      .select("doc_id", "term", "tf")
      .join(trainCnt, Seq("term"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("nll",
        log((col("train_tokens") + col("train_vocab") + 1).cast("double")
          / (coalesce(col("cnt"), lit(0L)) + 1).cast("double"))
          .cast(DecimalType(18, 9)))
      .groupBy("doc_id")
      .agg(sum(col("nll") * col("tf").cast(DecimalType(10, 0))).as("nll_sum"),
        sum(col("tf")).as("n_tokens"),
        sum(when(col("cnt").isNull, col("tf")).otherwise(lit(0L)))
          .as("oov_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        col("oov_tokens").cast("long").as("oov_tokens"),
        (col("nll_sum").cast("string").cast("double")
          / col("n_tokens").cast("double")).as("avg_nll"))
  }

  /** Kneser–Ney absolute discount — a POWER OF TWO, so c − D and the
    * λ numerator stay IEEE-exact on both engines. */
  val KnDiscount = 0.5

  /** INTERPOLATED KNESER–NEY bigram model (Kneser & Ney 1995; the
    * smoothing every n-gram LM toolkit defaults to) over the corpus:
    * for each OBSERVED bigram type (v, w),
    *
    *   p_kn(w|v) = (c(vw) − D)/c(v·) + (D·N1+(v·)/c(v·)) · (N1+(·w)/B)
    *
    * where c(v·) is the context total, N1+(v·) the distinct followers
    * of v, N1+(·w) the distinct contexts preceding w (the CONTINUATION
    * count — KN's insight: "how many contexts does w complete", not
    * "how often does w occur"), and B the total number of bigram
    * types. D = [[KnDiscount]]; every observed c(vw) ≥ 1 > D, so the
    * max(·,0) clamp never binds and is omitted.
    *
    * Emitted per bigram type with all its exact-integer evidence —
    * the MODEL TABLE a downstream scorer joins against (the
    * [[bigramSurprisal]] MLE table's production-grade replacement).
    *
    * Determinism: all five counts are exact integers; p_kn is a
    * fixed-shape IEEE tree — (c−D)/ctx + ((D·nf)/ctx)·(np/B) with
    * explicit parenthesization mirrored by the oracle — of
    * exact-integer-derived doubles.
    *
    * Scale (100 TB): state is keyed by bigram/unigram TYPES (model
    * tables, linear in vocabulary², not corpus); counts shuffle with
    * map-side combine; the type-count scalar broadcasts. Nothing is
    * pairwise in documents. */
  def kneserNeyBigrams(documents: DataFrame): DataFrame = {
    val bg = documents
      .select(col("doc_id"), Dedup.words(col("text")).as("w"))
      .select(explode(when(size(col("w")) >= 2,
          transform(sequence(lit(1), size(col("w")) - 1), i =>
            concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1))))
        .otherwise(array().cast("array<string>"))).as("bg"))
    val bgCnt = bg.groupBy("bg").agg(count(lit(1)).as("big_cnt"))
      .withColumn("pv", substring_index(col("bg"), " ", 1))
      .withColumn("cur", substring_index(col("bg"), " ", -1))
    val ctx = bgCnt.groupBy("pv")
      .agg(sum(col("big_cnt")).as("ctx_cnt"), count(lit(1)).as("n_follow"))
    val cont = bgCnt.groupBy("cur").agg(count(lit(1)).as("n_prec"))
    val types = bgCnt.agg(count(lit(1)).as("n_bigram_types"))
    val d = lit(KnDiscount)
    bgCnt.join(ctx, Seq("pv")).join(cont, Seq("cur"))
      .crossJoin(broadcast(types))
      .select(col("pv").as("prev_term"), col("cur").as("cur_term"),
        col("big_cnt"), col("ctx_cnt"), col("n_follow"), col("n_prec"),
        col("n_bigram_types"),
        ((col("big_cnt").cast("double") - d) / col("ctx_cnt").cast("double") +
          ((d * col("n_follow").cast("double")) / col("ctx_cnt").cast("double")) *
            (col("n_prec").cast("double") / col("n_bigram_types").cast("double")))
          .as("p_kn"))
  }

  /** Top-[[TfidfTopK]] terms per document by tf·idf (idf = ln(N/df))
    * — the classic document-keyword extraction pass.
    *
    * Unlike [[bm25]], this one DOES aggregate over the whole
    * vocabulary (that is its job), so the scale shape matters: tf
    * shuffles on (doc_id, term) with map-side combine, df is one
    * aggregation bounded by vocabulary size, N is a single broadcast
    * row, and the top-k is a keyed window per document — nothing is
    * quadratic and no state exceeds vocabulary × counters.
    *
    * Determinism: tf/df/N are exact integers; idf is the quantized-ln
    * recipe; the score is one double multiplication of identical
    * inputs; the ranking order is totalized by the term tiebreak. */
  def tfidfTopTerms(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = documents
      .select(col("doc_id"), explode(Dedup.words(col("text"))).as("term"))
      .repartition(col("doc_id"))
    val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val ndocs = documents.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, Seq("term")).crossJoin(broadcast(ndocs))
      .withColumn("idf",
        log(col("n_docs").cast("double") / col("df").cast("double"))
          .cast(org.apache.spark.sql.types.DecimalType(18, 9)).cast("double"))
      .withColumn("score", col("tf").cast("double") * col("idf"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score").desc, col("term").asc)))
      .filter(col("rank") <= TfidfTopK)
      .select("doc_id", "term", "tf", "score", "rank")
  }
}
