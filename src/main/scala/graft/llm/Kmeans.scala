package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic Lloyd (k-means) iterations over the embeddings table
  * — the clustering primitive behind curation-time diversity sampling
  * and IVF coarse-quantizer training.
  *
  * Everything is reproducible and engine-mirrorable, unlike MLlib's
  * sampled k-means|| init:
  *  - seeds are the K lowest vec_ids (a fixed, data-defined choice);
  *  - assignment is nearest-centroid by cosine with a centroid_id
  *    tiebreak (same recipe as [[Similarity.annIvfTopK]]);
  *  - new centroids are EXACT per-component means: decimal sums, one
  *    double division, presented as float per iteration so the next
  *    iteration starts from bit-identical values in both engines.
  *
  * Scale design (100 TB): each iteration broadcasts K centroids
  * (bounded), scores assignment in one scan (no shuffle of
  * embeddings), and shuffles only (centroid_id, idx, component) for
  * the mean — K × dim groups, independent of corpus size. Iterations
  * are FIXED at [[Iters]] (the oracle unrolls the same count);
  * convergence-based stopping would need a driver-side loop the
  * bounded unrolled form makes deterministic.
  */
object Kmeans {

  val K = 8
  val Iters = 2

  /** Exact component means of each assignment group, presented as
    * float (the IVF centroid determinism recipe). */
  private def means(assigned: DataFrame): DataFrame =
    assigned.select(col("centroid_id"), posexplode(col("embedding")).as(Seq("idx", "v")))
      .groupBy("centroid_id", "idx")
      .agg((sum(col("v").cast(DecimalType(27, 12))).cast("string").cast("double")
        / count(lit(1)).cast("double")).as("c"))
      .groupBy("centroid_id")
      .agg(array_sort(collect_list(struct(col("idx"), col("c")))).as("pairs"))
      .select(col("centroid_id"),
        transform(col("pairs"), p => p.getField("c").cast("float")).as("centroid"))

  /** Nearest-centroid assignment of every non-degenerate vector. */
  private def assign(withNorm: DataFrame, centroids: DataFrame): DataFrame =
    withNorm.crossJoin(broadcast(
        centroids.select(col("centroid_id"), col("centroid"),
          Similarity.dot(col("centroid"), col("centroid")).as("cnrm"))))
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        (Similarity.dot(col("embedding"), col("centroid"))
          / (sqrt(col("nrm")) * sqrt(col("cnrm")))).as("sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("sim").desc_nulls_last, col("centroid_id"))))
      .filter(col("rn") === 1)
      .select("vec_id", "embedding", "centroid_id")

  /** Run [[Iters]] Lloyd steps from the lowest-vec_id seeds; returns
    * the final centroids exploded to (centroid_id, idx, component)
    * rows — scalar columns, so the differential gate hashes them
    * directly. */
  def centroids(embeddingsRaw: DataFrame): DataFrame = {
    val withNorm = embeddingsRaw.repartition(col("vec_id")).select(
        col("vec_id"), col("embedding"),
        Similarity.dot(col("embedding"), col("embedding")).as("nrm"))
      .filter(col("nrm") > 0)
    var cents = withNorm.filter(col("vec_id") < K)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    for (_ <- 1 to Iters)
      cents = means(assign(withNorm, cents))
    cents.select(col("centroid_id"),
      posexplode(col("centroid")).as(Seq("idx", "component")))
      .select(col("centroid_id"), col("idx"),
        col("component").cast("double").as("component"))
  }
}
