package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global prefix sums — the running-total sibling of
  * [[Ranks]] (same two-phase shape, same single-execution guarantee).
  *
  * `sum(x).over(Window.orderBy(k))` with no partition is a
  * single-task global sort: fine for calendar-bounded series (the
  * documented exception), fatal for value-domain scans that grow with
  * the data (an ECDF over distinct transaction amounts, a survival
  * table over distinct tenures at sub-day grain). Two-phase form:
  *
  *   1. `repartitionByRange` on the (unique) order key: partition i
  *      holds a contiguous slice of the total order.
  *   2. per-partition running sums (keyed window — no global sort).
  *   3. per-partition TOTALS, cumulated exclusively via a non-equi
  *      self-join (P² pairs, P bounded by the shuffle-partition
  *      setting, never by data size) and broadcast back as offsets.
  *
  * The totals are read off `local` itself — the running sum AT the
  * partition's maximal key (a `max(struct(key, cum...))` pick, correct
  * for any sign of the summands, unlike `max(cum)`), so both consumers
  * share the byte-identical exchange→window subtree and ReuseExchange
  * collapses them to ONE physical range shuffle: offsets and local
  * sums see the same boundary sampling by construction (the Ranks
  * lesson, ADVICE r3 #1).
  *
  * Output is byte-identical to the single-partition window for any
  * input with a UNIQUE order key (callers pass a grouped/distinct
  * table; uniqueness makes the total order strict so no key straddles
  * a boundary ambiguously). Sums must be exact types (int/long/
  * decimal) — fp running sums are order-sensitive and belong in no
  * cross-engine contract. ScansSpec proves equality against the naive
  * window property-style, negatives included.
  */
object Scans {

  /** Adds `cum_<c>` (inclusive running sum over the total order of
    * `orderKey` ascending) for every c in `sumCols`. `orderKey` must
    * be unique per row and the summed columns exact-typed. Output
    * carries exactly `orderKey`, the `sumCols`, and the `cum_*`
    * columns (a slim projection — part of the reuse guarantee). */
  def prefixSums(df: DataFrame, orderKey: String, sumCols: Seq[String]): DataFrame = {
    // the range key lists EVERY input column (orderKey is unique, so
    // the trailing keys never order anything): the exchange then needs
    // all columns, column pruning cannot narrow one consumer's subtree
    // below it, and the two consumers stay canonically identical —
    // the precondition for ReuseExchange (the Ranks slim-projection
    // trick, generalized; ScansSpec asserts one live exchange)
    val slim = df.select(col(orderKey) +: sumCols.map(col): _*)
    val parted = slim
      .repartitionByRange(col(orderKey).asc +: sumCols.map(col(_).asc): _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(col(orderKey).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sumCols.foldLeft(parted) { (d, c) =>
      d.withColumn(s"__loc_$c", sum(col(c)).over(w))
    }
    // partition totals = the running sums AT the partition's last key
    // (max_by pick keyed on orderKey — sign-agnostic, unlike max(cum)),
    // aggregated DIRECTLY over `local` with no intermediate projection:
    // the Ranks shape, so ReuseExchange dedups the range shuffle (an
    // extra Project here lets column pruning diverge the self-join's
    // two subtrees and a second live range exchange appears — caught
    // by ScansSpec's plan assertion)
    val tot = local.groupBy("__pid").agg(
      max_by(col(s"__loc_${sumCols.head}"), col(orderKey)).as(s"__tot_${sumCols.head}"),
      sumCols.tail.map(c => max_by(col(s"__loc_$c"), col(orderKey)).as(s"__tot_$c")): _*)
    val offsets = tot.as("x")
      .join(broadcast(tot.as("y")), col("y.__pid") < col("x.__pid"), "left")
      .groupBy(col("x.__pid").as("__pid"))
      .agg(
        coalesce(sum(col(s"y.__tot_${sumCols.head}")), lit(0L)).as(s"__off_${sumCols.head}"),
        sumCols.tail.map(c =>
          coalesce(sum(col(s"y.__tot_$c")), lit(0L)).as(s"__off_$c")): _*)
    val joined = local.join(broadcast(offsets), Seq("__pid"))
    sumCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"cum_$c", col(s"__off_$c") + col(s"__loc_$c"))
    }.drop("__pid" +: sumCols.flatMap(c => Seq(s"__loc_$c", s"__off_$c")): _*)
  }
}
