package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Curriculum binning — order training data by difficulty (curriculum
  * learning, Bengio et al.): assign every document to a difficulty
  * band by QUARTILE of its LM surprisal, so a training scheduler can
  * feed easy→hard (or mix bands at fixed ratios) without a global
  * sort.
  *
  * The quartile thresholds come from the mergeable equi-width
  * histogram sketch ([[graft.operators.Sketches.histogramQuantiles]])
  * — NOT an exact percentile: an exact global percentile needs all
  * values in one place, while the histogram's state is HistBins
  * counters regardless of corpus size, and its interpolated estimate
  * is deterministic (IEEE-only arithmetic, gated by its own query).
  * Band assignment is then one broadcast of a single 3-threshold row
  * against the corpus — no shuffle at all.
  */
object Curriculum {

  val Quartiles: Seq[Double] = Seq(0.25, 0.5, 0.75)

  /** (doc_id, avg_nll, band) over the surprisal table: band =
    * easy | medium | hard | expert by ascending surprisal quartile
    * (boundary values land in the LOWER band: `avg_nll <= threshold`,
    * mirrored exactly in the oracle). */
  def bins(surprisal: DataFrame): DataFrame = {
    val grouped = surprisal.select(lit("all").as("g"), col("avg_nll"))
    val th = graft.operators.Sketches
      .histogramQuantiles(grouped, Seq("g"), col("avg_nll"), Quartiles)
      .groupBy("g")
      .agg(
        max(when(col("q") === Quartiles(0), col("est"))).as("t25"),
        max(when(col("q") === Quartiles(1), col("est"))).as("t50"),
        max(when(col("q") === Quartiles(2), col("est"))).as("t75"))
      .drop("g")
    surprisal.crossJoin(broadcast(th))
      .select(col("doc_id"), col("avg_nll"),
        when(col("avg_nll") <= col("t25"), "easy")
          .when(col("avg_nll") <= col("t50"), "medium")
          .when(col("avg_nll") <= col("t75"), "hard")
          .otherwise("expert").as("band"))
  }
}
