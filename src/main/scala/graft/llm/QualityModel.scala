package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    HashEmbed.hashedEmbeddings(documents).select("doc_id", "bucket", "v")
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
                     stats: DataFrame): DataFrame = {
    val x = features(documents)
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
                  weights: DataFrame): DataFrame = {
    val wFinal = weights.filter(col("round") === Rounds)
      .select(col("dim").as("bucket"), col("weight"))
    val margins = features(documents)
      .join(broadcast(wFinal), Seq("bucket"))
      .groupBy("doc_id").agg(sum(col("v") * col("weight")).as("margin"))
    labels(stats).join(margins, Seq("doc_id"))
      .select(col("doc_id"), col("y").cast("int").as("label"),
        col("margin"),
        when(col("margin") > 0, 1).otherwise(0).cast("int").as("predicted"))
  }
}
