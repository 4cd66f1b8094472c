package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable deterministic global ordinal — `zipWithIndex` for
  * DataFrames, without the trap every naive version hits:
  * `row_number() OVER (ORDER BY …)` is a SINGLE-partition window, one
  * task sorting the whole corpus (the exact anti-pattern RanksSpec
  * polices for global ranks).
  *
  * Two-phase construction instead:
  *   1. range-bucket on the HIGH [[BucketBits]] bits of the 60-bit
  *      order hash (a prefix of the sort key, so (bucket, h, tie)
  *      lexicographic order IS (h, tie) order), rank within each
  *      bucket in parallel;
  *   2. per-bucket counts → prefix-sum offsets over the BOUNDED bucket
  *      domain (at most [[Buckets]] rows — the only unpartitioned
  *      window, fixed size regardless of corpus size), broadcast back.
  * global position = bucket offset + in-bucket rank − 1. Uniform hash
  * ⇒ balanced buckets (corpus/1024 per sort task at the default);
  * grow [[BucketBits]] with the cluster — the RESULT is invariant to
  * the bucket count (the bucket is a prefix of the sort key, so any
  * B yields the same total order), only task granularity changes.
  *
  * The training use is the EPOCH SHUFFLE: a data loader wants every
  * document exactly once per epoch in a deterministic pseudo-random
  * order (reshuffled per epoch, reproducible across reruns and
  * engines). Hashing the id with an epoch salt gives exactly that —
  * no RNG, no partition dependence, mirrorable in the oracle.
  */
object GlobalIndex {

  val BucketBits = 10
  val Buckets = 1 << BucketBits // 1024

  /** Appends `posCol`: the 0-based global ordinal of each row under
    * (hashCol, tieCol) ascending. `hashCol` must be a 60-bit
    * non-negative long (the md5-60 device); `tieCol` must make the
    * order total (a unique id). */
  def withGlobalIndex(df: DataFrame, hashCol: Column, tieCol: Column,
                      posCol: String = "global_pos"): DataFrame = {
    val bucketed = df.withColumn("__gi_bkt", shiftright(hashCol, 60 - BucketBits))
    val ranked = bucketed.withColumn("__gi_rn", row_number().over(
      Window.partitionBy(col("__gi_bkt")).orderBy(hashCol.asc, tieCol.asc)))
    // bounded offset table: one row per occupied bucket, cumsum over
    // at most Buckets rows — single-partition by construction, by
    // design (the domain is fixed, not data-scaled)
    val offsets = bucketed.groupBy(col("__gi_bkt")).agg(count(lit(1)).as("__gi_n"))
      .withColumn("__gi_off",
        coalesce(sum(col("__gi_n")).over(
          BoundedWindow.orderBy(col("__gi_bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__gi_bkt"), col("__gi_off"))
    ranked.join(broadcast(offsets), Seq("__gi_bkt"))
      .withColumn(posCol, col("__gi_off") + col("__gi_rn") - 1)
      .drop("__gi_bkt", "__gi_rn", "__gi_off")
  }

  val EpochSaltPrefix = "epoch"

  /** Deterministic per-epoch corpus shuffle: (doc_id, shuffle_pos)
    * where shuffle_pos is the document's 0-based position in epoch
    * `epoch`'s order — the md5-60 of the epoch-salted id, totally
    * ordered by (hash, doc_id). */
  def epochShuffle(documents: DataFrame, epoch: Int = 0,
                   idCol: String = "doc_id"): DataFrame = {
    val h = graft.llm.Dedup.hex60(
      concat(lit(s"$EpochSaltPrefix$epoch|"), col(idCol).cast("string")))
    withGlobalIndex(documents.select(col(idCol)).withColumn("__gi_h", h),
      col("__gi_h"), col(idCol), "shuffle_pos")
      .select(col(idCol), col("shuffle_pos"))
  }
}
