package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global ranking (VERDICT r2 "Next round" #1).
  *
  * `row_number().over(Window.orderBy(...))` with no partition moves the
  * ENTIRE input to one task — fine for genuinely bounded dims (25
  * locations, ~80 months), fatal for dims that grow with the data
  * (products is part-backed: SF×200k rows; ~2×10⁹ at the 100 TB
  * target). This is the two-phase form that scales:
  *
  *   1. `repartitionByRange` on the sort key: partition i holds a
  *      contiguous range of the total order (RangePartitioner samples
  *      boundaries; every partition gets ~n/P rows, no hot task).
  *   2. per-partition `row_number` (keyed window — no global sort).
  *   3. add per-partition offsets: a tiny (≤P rows) count aggregate,
  *      cumulated via a non-equi self-join (P² pairs, P = shuffle
  *      partitions — bounded by cluster size, never by data size; also
  *      keeps the plan free of single-partition WindowExec stages) and
  *      broadcast back.
  *
  * Output is byte-identical to the single-partition window for any
  * input: range partitioning guarantees cross-partition order, the
  * unique tiebreak key makes the total order strict (no ties can
  * straddle a boundary), and offsets are exact counts. Proven
  * property-style in RanksSpec against the naive window.
  *
  * Single-execution guarantee (ADVICE r3 #1): the offsets subplan and
  * the main subplan both reference `local` — the SAME
  * exchange→sort→window subtree — so Spark's ReuseExchange rule
  * deduplicates the range shuffle and both sides read ONE materialized
  * exchange output. Partition ids therefore come from one boundary
  * sampling, never two (a nondeterministically-ordered upstream or a
  * task retry cannot desynchronize them). RanksSpec asserts the
  * executed plan contains a ReusedExchange over the range partitioning.
  */
object Ranks {

  /** (key, rankName) table: rank 1 = largest metric, nulls last,
    * ascending unique `key` as tiebreak — join back on `key`. */
  def globalRank(df: DataFrame, key: String, metric: Column, rankName: String): DataFrame =
    rankedCore(df, key, metric, rankName).select(col(key), col(rankName))

  /** Like [[globalRank]] but ALSO emits the ranked metric as
    * `valueName` — for callers that need the value AT a rank (order
    * statistics: medians, percentile picks). Carrying the value
    * through the rank pipeline replaces the join-back on `key` the
    * 2-column form forces: one fewer join in the caller's plan, and —
    * because that join-back is typically the caller's only UNHINTED
    * join — the plan's exchange count stops depending on Catalyst's
    * size estimates (the revenue_theilsen budget churn of r12). */
  def globalRankWithValue(df: DataFrame, key: String, metric: Column,
                          valueName: String, rankName: String): DataFrame =
    rankedCore(df, key, metric, rankName)
      .select(col(key), col("__m").as(valueName), col(rankName))

  private def rankedCore(df: DataFrame, key: String, metric: Column,
                         rankName: String): DataFrame = {
    val order = Seq(col("__m").desc_nulls_last, col(key).asc)
    val slim = df.select(col(key), metric.as("__m"))
    val parted = slim
      .repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
    val local = parted.withColumn("__rn",
      row_number().over(Window.partitionBy("__pid").orderBy(order: _*)))
    // per-pid counts derived from `local` (max row_number), NOT from a
    // separate aggregation over `parted`: both consumers now share the
    // byte-identical exchange+window subtree, which ReuseExchange
    // collapses to a single physical exchange — offsets and ranks see
    // the same partition assignment by construction.
    val counts = local.groupBy("__pid").agg(max(col("__rn")).cast("long").as("__cnt"))
    val offsets = counts.as("x")
      .join(broadcast(counts.as("y")), col("y.__pid") < col("x.__pid"), "left")
      .groupBy(col("x.__pid").as("__pid"))
      .agg(coalesce(sum(col("y.__cnt")), lit(0L)).as("__offset"))
    local.join(broadcast(offsets), Seq("__pid"))
      .select(col(key), col("__m"),
        (col("__offset") + col("__rn")).cast("int").as(rankName))
  }

  /** Fold several metrics into rank columns joined onto `df` by `key`.
    * Each rank is its own range-sorted pass over a 2-column projection
    * of `df` — callers pass a materialized table so the passes are
    * pruned column scans, not plan re-executions. */
  def withGlobalRanks(df: DataFrame, key: String, ranks: Seq[(String, Column)]): DataFrame =
    ranks.foldLeft(df) { case (acc, (name, metric)) =>
      acc.join(globalRank(df, key, metric, name), Seq(key))
    }
}
