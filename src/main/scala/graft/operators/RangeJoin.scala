package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join via overlap bucketing — the second classic
  * operator Spark has no native form for: match each fact row's scalar
  * to the interval rows containing it (`lo <= v < hi`).
  *
  * Spark plans a plain `fact JOIN ranges ON v >= lo AND v < hi` as a
  * broadcast nested-loop join: every fact row tests EVERY range —
  * O(|fact| × |ranges|), a scale killer the moment the ranges side
  * stops being tiny. Overlap bucketing restores an equi-join:
  *
  *   1. pick a bucket width `step`; a fact row lands in exactly ONE
  *      bucket `floor(v / step)`;
  *   2. each range row is replicated to every bucket its interval
  *      overlaps (a `sequence` + `explode`, bounded by
  *      ceil(span/step) + 1 copies);
  *   3. hash equi-join on the bucket id — shuffle-partitionable,
  *      AQE-skew-splittable, broadcastable — then the exact `[lo, hi)`
  *      predicate filters within the bucket.
  *
  * A (fact, range) pair can only meet in the fact's single bucket, so
  * no post-join dedup is needed. Cost scales with |fact| +
  * |ranges| × avg-buckets-per-range, not their product; `step` tunes
  * replication vs selectivity (≈ median interval width is a good
  * default).
  */
object RangeJoin {

  /** Replication guard default: a range spanning more buckets than
    * this fails fast with a step-tuning message instead of letting
    * `sequence()` build a huge array (bad units, an open-ended
    * sentinel hi) that would hit Spark's sequence length limit or
    * executor memory with an opaque error (ADVICE r5). */
  val DefaultMaxBucketsPerRange: Long = 4096L

  /** `fact ⋈ ranges` on `lo <= valueCol < hi` as a bucketed equi-join.
    * `joinType` "inner" or "left" (left keeps unmatched fact rows). */
  def bucketed(fact: DataFrame, ranges: DataFrame, valueCol: Column,
               loCol: Column, hiCol: Column, step: Double,
               joinType: String = "inner",
               maxBucketsPerRange: Long = DefaultMaxBucketsPerRange): DataFrame = {
    require(step > 0, "step must be positive")
    require(maxBucketsPerRange > 0, "maxBucketsPerRange must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"bucketed range join supports inner/left only, got $joinType")
    val f = fact.withColumn("__bkt", floor(valueCol / step))
    // [lo, hi): the hi bucket is still needed when hi is not on a
    // bucket boundary (a fact value just under hi lands there); the
    // exact predicate below re-excludes v == hi either way.
    // Per-row replication guard: evaluated BEFORE the explode, so an
    // oversized interval raises a targeted error instead of an OOM or
    // sequence-length failure deep in the join. The CASE is lazy —
    // the error branch costs nothing on conforming rows. The raise
    // condition is `nBkts > max` (not the negation of `<=`): a NULL
    // lo/hi makes nBkts NULL, which must fall through to the sequence
    // (itself NULL → explode drops the row, the pre-guard behavior —
    // a null-bounded interval can never match the exact predicate).
    val nBkts = floor(hiCol / step) - floor(loCol / step) + lit(1L)
    val guarded = when(nBkts > maxBucketsPerRange,
        raise_error(concat(
          lit("range join: interval spans "), nBkts.cast("string"),
          lit(s" buckets > maxBucketsPerRange=$maxBucketsPerRange; " +
            s"raise step (currently $step) or maxBucketsPerRange"))))
      .otherwise(sequence(floor(loCol / step), floor(hiCol / step)))
    val r = ranges.withColumn("__bkt", explode(guarded))
    f.join(r, f("__bkt") === r("__bkt") &&
        valueCol >= loCol && valueCol < hiCol, joinType)
      .drop("__bkt")
  }
}
