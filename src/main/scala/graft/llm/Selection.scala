package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Targeted DATA SELECTION for LM training corpora — the published
  * pair of methods a pipeline runs when it wants "more like this
  * domain" out of a web-scale crawl:
  *
  *  - Moore–Lewis cross-entropy difference (Moore & Lewis 2010,
  *    "Intelligent Selection of Language Model Training Data"):
  *    score every document by H_in(doc) − H_gen(doc) under two
  *    Laplace-smoothed unigram LMs; keep documents the IN-DOMAIN
  *    model finds easier than the GENERAL model.
  *  - DSIR (Xie et al. 2023, "Data Selection for Language Models via
  *    Importance Resampling"): the same likelihood-ratio idea made
  *    web-scale by replacing the vocabulary with HASHED n-gram
  *    feature buckets — the target/raw bucket distributions are
  *    fixed-size ([[DsirBuckets]]) regardless of corpus size, so the
  *    model state broadcasts no matter how big the crawl is.
  *
  * Scale design (100 TB): both methods are one tokenize/feature pass
  * per document (term- or bucket-keyed counts with map-side combine),
  * one VOCAB- or BUCKET-bounded model table joined back (the DSIR
  * table is exactly [[DsirBuckets]] rows — broadcast; the Moore–Lewis
  * vocab table is |V| rows, term-keyed), and a per-doc exact-decimal
  * fold. Nothing is pairwise; the corpus is read once per method.
  *
  * Determinism (the oracle gate): counts and smoothing denominators
  * are exact integers; each per-term/per-bucket log-ratio is ONE ln
  * of an exact-integer ratio quantized to decimal(18,9) (the
  * [[Relevance.heldoutSurprisal]] recipe); per-doc sums multiply
  * decimal(18,9) × narrow decimal(10,0) (exact, no precision-39
  * truncation) and the SELECTION PREDICATE compares exact decimals,
  * never doubles; the reported score is one final IEEE division. */
object Selection {

  /** The in-domain slice both selectors target: one source of the
    * documents table (the "I want more like src0" request). */
  val InDomainSource = "src0"

  /** DSIR hashed-feature bucket count. 256 keeps the differential
    * corpus's bucket table readable; production uses 10k–100k —
    * nothing below depends on the constant (the point of hashing is
    * that model size is THIS constant, not |vocab|). */
  val DsirBuckets = 256L

  private def dec9 = DecimalType(18, 9)
  private def dec10 = DecimalType(10, 0)

  /** Per-document term frequencies (doc_id, term, tf) — one tokenize
    * pass, (doc, term)-keyed count with map-side combine. */
  private def termFreqs(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(Dedup.words(col("text"))).as("term"))
      .repartition(col("doc_id"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Moore–Lewis selection: per document, the average cross-entropy
    * DIFFERENCE under an in-domain vs a general Laplace-smoothed
    * unigram LM — ce_diff = (Σ tf·nll_in − Σ tf·nll_gen)/n_tokens,
    * nll_X(term) = ln((T_X + V_X + 1)/(c_X(term) + 1)) quantized to
    * decimal(18,9). `selected` compares the two EXACT decimal sums
    * (never the divided double): the in-domain model must find the
    * document strictly easier than the general model.
    *
    * Both LMs smooth over their OWN (tokens, vocab) — the
    * [[Relevance.heldoutSurprisal]] convention; an unseen term costs
    * the model's smoothing floor ln(T+V+1). */
  def mooreLewis(documents: DataFrame): DataFrame = {
    val tf = termFreqs(documents)
    val inIds = documents.filter(col("source") === InDomainSource)
      .select("doc_id")
    val inCnt = tf.join(inIds, Seq("doc_id"), "left_semi")
      .groupBy("term").agg(sum("tf").as("c_in"))
    val genCnt = tf.groupBy("term").agg(sum("tf").as("c_gen"))
    val stats = inCnt.agg(coalesce(sum("c_in"), lit(0L)).as("t_in"),
        count(lit(1)).as("v_in"))
      .crossJoin(broadcast(
        genCnt.agg(sum("c_gen").as("t_gen"), count(lit(1)).as("v_gen"))))
    tf
      .join(genCnt, Seq("term"))
      .join(inCnt, Seq("term"), "left")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("tf"),
        log((col("t_in") + col("v_in") + 1).cast("double")
          / (coalesce(col("c_in"), lit(0L)) + 1).cast("double"))
          .cast(dec9).as("nll_in"),
        log((col("t_gen") + col("v_gen") + 1).cast("double")
          / (col("c_gen") + 1).cast("double"))
          .cast(dec9).as("nll_gen"))
      .groupBy("doc_id")
      // the sums land at decimal(38,9); subtracting two of those would
      // promote to precision 39 > 38 and Spark silently DROPS the
      // result to scale 8, rounding each ce_diff by up to 5e-9 (the
      // unigramSurprisal precision-39 trap, caught by this oracle
      // gate too) — narrowing to (28,9) first keeps the subtraction
      // exact with 19 integral digits of headroom
      .agg(sum(col("nll_in") * col("tf").cast(dec10))
          .cast(DecimalType(28, 9)).as("s_in"),
        sum(col("nll_gen") * col("tf").cast(dec10))
          .cast(DecimalType(28, 9)).as("s_gen"),
        sum(col("tf")).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        ((col("s_in") - col("s_gen")).cast("string").cast("double")
          / col("n_tokens").cast("double")).as("ce_diff"),
        (col("s_in") < col("s_gen")).as("selected"))
  }

  /** Per-document hashed n-gram feature counts (doc_id, bkt, c):
    * unigrams AND bigrams hashed into [[DsirBuckets]] buckets — the
    * DSIR feature space. One pass; the bigram stream reuses the
    * token array before it explodes. */
  def hashedFeatures(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), Dedup.words(col("text")).as("w"))
      .repartition(col("doc_id"))
    val feats = toks.select(col("doc_id"), explode(concat(
      col("w"),
      when(size(col("w")) >= 2,
        transform(sequence(lit(1), size(col("w")) - 1),
          i => concat(element_at(col("w"), i), lit(" "),
            element_at(col("w"), i + 1))))
        .otherwise(array().cast("array<string>")))).as("feat"))
    feats
      .select(col("doc_id"),
        pmod(Dedup.hex60(col("feat")), lit(DsirBuckets)).as("bkt"))
      .groupBy("doc_id", "bkt").agg(count(lit(1)).as("c"))
  }

  /** DSIR importance weights: per document, the hashed-feature
    * log-likelihood ratio Σ_b c_b·lr(b) with
    * lr(b) = ln( ((c_tgt(b)+1)·(T_raw+B)) / ((c_raw(b)+1)·(T_tgt+B)) )
    * quantized to decimal(18,9) — target = the [[InDomainSource]]
    * slice, raw = the whole corpus, +1/B Laplace smoothing on both.
    * `keep` (importance ≥ 1, i.e. Σ > 0) compares the exact decimal
    * sum against zero; log_weight is the one-division double report.
    *
    * The ln argument multiplies two exact Longs in DOUBLE — exact
    * below 2^53, which holds to ~10^8-token differential corpora; at
    * real scale compute lr as ln(a)−ln(b) in the same quantization
    * (documented, not needed at the driver's SFs). */
  def dsirWeights(documents: DataFrame): DataFrame = {
    val fc = hashedFeatures(documents)
    val tgtIds = documents.filter(col("source") === InDomainSource)
      .select("doc_id")
    val tgt = fc.join(tgtIds, Seq("doc_id"), "left_semi")
      .groupBy("bkt").agg(sum("c").as("c_tgt"))
    val raw = fc.groupBy("bkt").agg(sum("c").as("c_raw"))
    val stats = tgt.agg(coalesce(sum("c_tgt"), lit(0L)).as("t_tgt"))
      .crossJoin(broadcast(raw.agg(sum("c_raw").as("t_raw"))))
    val model = raw.join(tgt, Seq("bkt"), "left")
      .crossJoin(broadcast(stats))
      .select(col("bkt"),
        log(((coalesce(col("c_tgt"), lit(0L)) + 1)
            * (col("t_raw") + DsirBuckets)).cast("double")
          / ((col("c_raw") + 1) * (col("t_tgt") + DsirBuckets)).cast("double"))
          .cast(dec9).as("lr"))
    fc.join(broadcast(model), Seq("bkt"))
      .groupBy("doc_id")
      .agg(sum(col("lr") * col("c").cast(dec10)).as("s"),
        sum(col("c")).as("n_feats"))
      .select(col("doc_id"), col("n_feats"),
        (col("s").cast("string").cast("double")).as("log_weight"),
        (col("s") > lit(0).cast(dec9)).as("keep"))
  }

  /** QUALITY–LENGTH PARETO FRONTIER (the skyline operator,
    * Börzsönyi/Kossmann/Stocker 2001, applied to exemplar picking):
    * the documents where you cannot get a higher classifier margin
    * without paying more tokens — i.e. doc x survives iff no doc has
    * (n_tokens ≤, margin ≥) with one strict. The frontier is what an
    * exemplar/few-shot picker reads instead of a single top-k: every
    * length budget's best-available quality, in one relation.
    *
    * Scale design: the naive skyline is all-pairs; this one is the
    * 2-D sort-sweep factored for a cluster — one hash-partitioned
    * groupBy collapses the corpus to its DISTINCT TOKEN-LENGTH values
    * (bounded by max document length, never corpus size), the
    * prefix-max sweep runs on that bounded aggregate (the documented
    * bounded-global-window shape), and one broadcast semi-join pulls
    * the surviving docs back out. Corpus is read once; nothing is
    * pairwise.
    *
    * Determinism: token counts and perceptron margins are exact
    * integers end to end; ties on BOTH dims are mutually non-
    * dominating and all emitted (no arbitrary pick). */
  def qualityPareto(documents: DataFrame, preds: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = documents
      .select(col("doc_id"),
        size(Dedup.words(col("text"))).cast("long").as("n_tokens"))
      .join(preds.select(col("doc_id"), col("margin")), Seq("doc_id"))
    val byTok = d.groupBy("n_tokens").agg(max(col("margin")).as("m"))
    val w = graft.operators.BoundedWindow.orderBy(col("n_tokens"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = byTok
      .withColumn("prev", max(col("m")).over(w))
      .filter(col("prev").isNull || col("m") > col("prev"))
      // rename: frontier derives from d, a same-name join would be an
      // ambiguous self-join lineage
      .select(col("n_tokens").as("f_tokens"), col("m").as("f_margin"))
    d.join(broadcast(frontier),
        col("n_tokens") === col("f_tokens") && col("margin") === col("f_margin"))
      .select("doc_id", "n_tokens", "margin")
  }
}
