package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A TRAINED text-quality classifier — the fasttext-style linear
  * filter every LLM data pipeline eventually ships (CCNet / GPT-3's
  * quality model): distill a heuristic quality signal into a cheap
  * linear model over [[HashEmbed]]'s feature-hashed token vectors, so
  * the expensive signal is computed once and the model scores
  * everything thereafter.
  *
  * Training is FULL-BATCH perceptron descent, the distributed
  * parameter-server pattern made deterministic:
  *
  *   margin_d = w_t · x_d             (exact Long dot, long format)
  *   err_d    = y_d − [margin_d > 0]  (∈ {−1, 0, 1})
  *   w_{t+1}  = w_t + Σ_d err_d · x_d (exact Long per-dim sums)
  *
  * Each round broadcasts the (Dim+1)-row weight table and aggregates
  * one gradient pass over the corpus — exactly how distributed LR
  * trains (weights out, gradients in), but with η=1 over integer
  * features so weights stay integers forever: no float accumulation
  * order, no sigmoid, bit-identical under ANY partitioning, and the
  * DuckDB oracle replays training as [[Rounds]] unrolled CTE rounds
  * (the kmeans/BPE/PageRank recipe).
  *
  * Labels are the weak supervision a real pipeline uses: y = 1 iff
  * the heuristic quality_score clears [[Curation.MinQuality]] — the
  * model learns to imitate the rule from token evidence alone.
  *
  * Scale (100 TB): per round, ONE broadcast of Dim+1 longs and ONE
  * map-side-combined groupBy over the long-format feature table
  * (rows = corpus tokens' distinct (doc, bucket) pairs); margins are
  * a broadcast-join sum per doc. Nothing is collected, nothing is
  * pairwise, and rounds are a constant. Weight magnitudes are bounded
  * by Rounds · Σ_d |x_d| ≪ Long range.
  */
object QualityModel {

  val Rounds = 3
  /** The bias rides as one extra always-1 feature dimension. */
  val BiasDim: Int = HashEmbed.Dim

  /** Long-format features: the hashed-embedding buckets plus the
    * bias dimension (bucket [[BiasDim]], v = 1) for every doc. */
  def features(documents: DataFrame): DataFrame =
    features(documents, HashEmbed.hashedEmbeddings(documents))

  /** [[features]] over a PRECOMPUTED hashed-embedding long table —
    * callers with a Mat barrier for it pass it here so the corpus is
    * tokenized once per session, not once per consumer. */
  def features(documents: DataFrame, emb: DataFrame): DataFrame =
    emb.select("doc_id", "bucket", "v")
      .unionByName(documents.select(col("doc_id"),
        lit(BiasDim).as("bucket"), lit(1L).as("v")))

  /** Weak labels from the heuristic quality score. */
  def labels(stats: DataFrame): DataFrame =
    stats.select(col("doc_id"),
      (col("quality_score") >= Curation.MinQuality).cast("long").as("y"))

  /** The full training trajectory: (round, dim, weight) for rounds
    * 1..[[Rounds]], dims 0..[[BiasDim]]. Round t's weights are the
    * state AFTER t full-batch updates from zero initialization. */
  def trainedWeights(spark: SparkSession, documents: DataFrame,
                     stats: DataFrame): DataFrame =
    trainedWeights(spark, documents, stats, HashEmbed.hashedEmbeddings(documents))

  /** [[trainedWeights]] over a precomputed hashed-embedding table. */
  def trainedWeights(spark: SparkSession, documents: DataFrame,
                     stats: DataFrame, emb: DataFrame): DataFrame = {
    val x = features(documents, emb)
    val y = labels(stats)
    var w = spark.range(BiasDim + 1)
      .select(col("id").cast("int").as("dim"), lit(0L).as("weight"))
    val trajectory = (1 to Rounds).map { t =>
      val margins = x
        .join(broadcast(w.select(col("dim").as("bucket"), col("weight"))),
          Seq("bucket"))
        .groupBy("doc_id").agg(sum(col("v") * col("weight")).as("m"))
      val err = y.join(margins, Seq("doc_id"))
        .select(col("doc_id"),
          (col("y") - when(col("m") > 0, 1L).otherwise(0L)).as("e"))
        .filter(col("e") =!= 0)
      val grad = x.join(err, Seq("doc_id"))
        .groupBy("bucket").agg(sum(col("v") * col("e")).as("g"))
      w = w.join(grad.select(col("bucket").as("dim"), col("g")), Seq("dim"), "left")
        .select(col("dim"), (col("weight") + coalesce(col("g"), lit(0L))).as("weight"))
        // eager per-round checkpoint: round t+1's plan starts from 17
        // materialized rows, not t corpus passes of lineage
        .localCheckpoint(true)
      w.select(lit(t).as("round"), col("dim"), col("weight"))
    }
    trajectory.reduce(_ unionByName _)
  }

  /** Score the corpus with the FINAL round's weights (read from the
    * materialized trajectory): exact integer margin, hard prediction,
    * and the weak label for agreement auditing. */
  def predictions(documents: DataFrame, stats: DataFrame,
                  weights: DataFrame): DataFrame =
    predictions(documents, stats, weights, HashEmbed.hashedEmbeddings(documents))

  /** [[predictions]] over a precomputed hashed-embedding table. */
  def predictions(documents: DataFrame, stats: DataFrame,
                  weights: DataFrame, emb: DataFrame): DataFrame = {
    val wFinal = weights.filter(col("round") === Rounds)
      .select(col("dim").as("bucket"), col("weight"))
    val margins = features(documents, emb)
      .join(broadcast(wFinal), Seq("bucket"))
      .groupBy("doc_id").agg(sum(col("v") * col("weight")).as("margin"))
    labels(stats).join(margins, Seq("doc_id"))
      .select(col("doc_id"), col("y").cast("int").as("label"),
        col("margin"),
        when(col("margin") > 0, 1).otherwise(0).cast("int").as("predicted"))
  }

  /** LABEL-FREE scoring with the final round's weights — the
    * production inference shape (new docs have no weak label yet):
    * exact integer margin + hard prediction per doc. Batch-local
    * work only (features are per-doc), so it drops into a streaming
    * foreachBatch unchanged. */
  def score(documents: DataFrame, weights: DataFrame): DataFrame = {
    val wFinal = weights.filter(col("round") === Rounds)
      .select(col("dim").as("bucket"), col("weight"))
    features(documents)
      .join(broadcast(wFinal), Seq("bucket"))
      .groupBy("doc_id").agg(sum(col("v") * col("weight")).as("margin"))
      .select(col("doc_id"), col("margin"),
        when(col("margin") > 0, 1).otherwise(0).cast("int").as("predicted"))
  }

  /** Classifier evaluation over [[predictions]] — the model card a
    * quality filter ships with before it gates a corpus: confusion
    * counts, accuracy/precision/recall/F1, and ROC-AUC.
    *
    * AUC is the Mann-Whitney U statistic with AVERAGE ranks for ties
    * (integer margins tie constantly), kept EXACT until the final
    * division: with per-distinct-margin group stats (n docs, np
    * positives) and `before` = docs with strictly smaller margin,
    * twice the positives' rank sum is the integer
    * Σ np·(2·before + n + 1), and
    * AUC = (2·Σranks − 2·npos·(npos+1)/2) / (2·npos·nneg) — one double
    * division of exact longs, so both engines agree bit-for-bit (a
    * floating rank sum would be partition-order dependent). All other
    * ratios are likewise single divisions of exact counts.
    *
    * Scale: the confusion row is one map-side-combined aggregate over
    * the predictions; the rank sum runs over DISTINCT margins — the
    * global-order window is a single-partition sort of at most
    * |distinct integer margins| rows (≪ corpus; bounded by the weight
    * table's magnitude range), the same deliberate trade the two-phase
    * global rank makes for its tiny phase-1 table. */
  def evaluation(pred: DataFrame): DataFrame = {
    val byMargin = pred.groupBy("margin")
      .agg(count(lit(1)).as("n"), sum("label").as("np"))
    val before = coalesce(
      sum(col("n")).over(
        graft.operators.BoundedWindow.orderBy(col("margin"))
          .rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val rankSum2 = byMargin.withColumn("before", before)
      .agg(sum(col("np") * (lit(2L) * col("before") + col("n") + lit(1L)))
        .as("pos_rank_sum_2"))
    val confusion = pred.agg(
      count(lit(1)).as("n_docs"),
      sum(col("label")).as("n_pos"),
      sum(lit(1L) - col("label")).as("n_neg"),
      sum(when(col("label") === 1 && col("predicted") === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col("label") === 0 && col("predicted") === 1, 1L).otherwise(0L)).as("fp"),
      sum(when(col("label") === 1 && col("predicted") === 0, 1L).otherwise(0L)).as("fn"),
      sum(when(col("label") === 0 && col("predicted") === 0, 1L).otherwise(0L)).as("tn"))
    confusion.crossJoin(broadcast(rankSum2))
      .select(col("n_docs"), col("n_pos"), col("n_neg"),
        col("tp"), col("fp"), col("fn"), col("tn"),
        ((col("tp") + col("tn")).cast("double") / col("n_docs")).as("accuracy"),
        (col("tp").cast("double") / (col("tp") + col("fp"))).as("precision"),
        (col("tp").cast("double") / (col("tp") + col("fn"))).as("recall"),
        ((lit(2L) * col("tp")).cast("double")
          / (lit(2L) * col("tp") + col("fp") + col("fn"))).as("f1"),
        ((col("pos_rank_sum_2") - col("n_pos") * (col("n_pos") + 1L)).cast("double")
          / (lit(2L) * col("n_pos") * col("n_neg")).cast("double")).as("auc"))
  }

  /** CALIBRATION reliability table over [[predictions]] — the check a
    * score needs before it becomes a keep/drop threshold: docs
    * decile-bucketed by exact margin (the two-phase global rank's
    * ntile, margin desc with doc_id tiebreak — deterministic under
    * constant integer-margin ties), and per bucket the empirical
    * positive rate vs the bucket's average margin. A well-calibrated
    * score shows pos_rate falling monotonically with the bucket index;
    * a flat tail says the threshold carries no signal there.
    *
    * Exactness: counts and margin sums are integers; the two ratios
    * are single double divisions of exact longs — bit-identical across
    * engines. Scale: the bucket assignment is [[graft.operators.Quantiles.exactBuckets]]
    * (range-partitioned two-phase rank, no single-partition window);
    * the rollup is a 10-row aggregate. */
  def calibration(pred: DataFrame): DataFrame = {
    val b = graft.operators.Quantiles
      .exactBuckets(pred.select("doc_id", "margin"), "doc_id", col("margin"), 10)
      .select(col("doc_id"), col("bucket"))
    pred.join(b, Seq("doc_id"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("label").cast("long")).as("n_pos"),
        sum(col("margin")).as("__sm"))
      .select(col("bucket"), col("n_docs"), col("n_pos"),
        (col("n_pos").cast("double") / col("n_docs").cast("double")).as("pos_rate"),
        (col("__sm").cast("double") / col("n_docs").cast("double")).as("avg_margin"))
  }

  /** Miscoverage targets for [[conformal]]. */
  val ConformalAlphas: Seq[Double] = Seq(0.1, 0.2)

  /** SPLIT-CONFORMAL PREDICTION SETS (Vovk et al.; the Angelopoulos &
    * Bates recipe) over the quality classifier — the query that prices
    * the model's UNCERTAINTY, not just its accuracy: for each target
    * miscoverage α, calibrate the nonconformity threshold q̂ on a
    * held-out split and report the measured holdout coverage and
    * average prediction-set size. A filter consuming the classifier
    * reads this row before trusting hard labels: avg_set_size near 1
    * with coverage ≥ 1−α means the margins separate; set sizes near 2
    * mean the model abstains and a human/second model must arbitrate.
    *
    * Nonconformity is label-directed margin: s(x, 1) = −margin,
    * s(x, 0) = +margin (exact int64 — confident-correct is very
    * negative). q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest calibration
    * score, the finite-sample-corrected order statistic; the
    * prediction set for a doc is {y : s(x, y) ≤ q̂}.
    *
    * Splits: calibration = salted-hash bucket 1, holdout = bucket 2
    * of [[Splits.saltedBucket]] mod 4 — the pipeline's ONE sampling
    * device, chosen over a raw doc_id mod because ids correlate with
    * planted content families (the dup structure is keyed doc_id % 5;
    * a raw mod-4 split measurably shifted coverage ~2σ low on both α).
    * The weights are the production trajectory (trained on the full
    * corpus), so the guarantee is conditional on that model; a
    * leakage-free variant retrains on the split complement — the trade
    * the leakage query family exists to price, documented rather than
    * hidden.
    *
    * Scale: scores are per-row; q̂ comes from a cumulative count over
    * DISTINCT integer scores (the [[evaluation]] AUC trade: the
    * single-partition window touches |distinct margins| rows, ≪
    * corpus); coverage is one map-side-combined aggregate. Doubles
    * only in the final two ratios. */
  /** Salt for the conformal calibration/holdout split. */
  val ConformalSalt = "conf|"

  def conformal(pred: DataFrame): DataFrame = {
    val split = Splits.saltedBucket(ConformalSalt, col("doc_id"), 4L)
    val cal = pred.filter(split === 1)
      .select(when(col("label") === 1, -col("margin"))
        .otherwise(col("margin")).as("s"))
    val nCal = cal.agg(count(lit(1)).as("n_cal"))
    val byScore = cal.groupBy("s").agg(count(lit(1)).as("n"))
    val cum = byScore.withColumn("cum",
      sum(col("n")).over(graft.operators.BoundedWindow.orderBy(col("s"))))
    val test = pred.filter(split === 2)
    ConformalAlphas.map { alpha =>
      // when ceil((n_cal+1)(1-alpha)) > n_cal the split is too small
      // for a finite q-hat: the standard split-conformal threshold is
      // +infinity (all sets full). cum maxes at n_cal, so the filter
      // empties and the ungrouped min yields NULL qhat — surfaced
      // as-is, with every prediction set full, instead of clamping to
      // the max calibration score and silently dropping the coverage
      // guarantee (ADVICE r15)
      val q = cum.crossJoin(broadcast(nCal))
        .withColumn("k",
          ceil((col("n_cal") + 1).cast("double") * lit(1.0 - alpha))
            .cast("long"))
        .filter(col("cum") >= col("k"))
        .agg(min(col("s")).as("qhat"))
      test.crossJoin(broadcast(q)).crossJoin(broadcast(nCal))
        .select(col("n_cal"), col("qhat"), col("label"),
          (col("qhat").isNull || -col("margin") <= col("qhat"))
            .cast("int").as("in1"),
          (col("qhat").isNull || col("margin") <= col("qhat"))
            .cast("int").as("in0"))
        .groupBy("n_cal", "qhat")
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("label") === 1, col("in1"))
            .otherwise(col("in0")).cast("long")).as("n_covered"),
          sum((col("in0") + col("in1")).cast("long")).as("__sz"),
          sum(when(col("in0") + col("in1") === 0, 1L).otherwise(0L))
            .as("n_empty"),
          sum(when(col("in0") + col("in1") === 2, 1L).otherwise(0L))
            .as("n_full"))
        .select(lit(alpha).as("alpha"), col("n_cal"), col("qhat"),
          col("n_test"), col("n_covered"),
          (col("n_covered").cast("double") / col("n_test").cast("double"))
            .as("coverage"),
          (col("__sz").cast("double") / col("n_test").cast("double"))
            .as("avg_set_size"),
          col("n_empty"), col("n_full"))
    }.reduce(_ unionByName _)
  }
}
