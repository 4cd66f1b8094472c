package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.lit

/** Deliberately-global windows over PROVABLY BOUNDED domains.
  *
  * `Window.orderBy(...)` with no partition executes on a single
  * partition, and WindowExec WARNs on every such plan — rightly, when
  * the input is corpus-sized (use [[Ranks.globalRank]]'s two-phase
  * shape there). But this engine runs dozens of windows whose input is
  * bounded BY CONSTRUCTION — calendar days, histogram deciles, hop
  * counts, |domains|, |strata|, distinct integer margins — where a
  * single partition is the designed plan, not an accident. Those
  * WARNs buried real ones (VERDICT r16 #7).
  *
  * [[BoundedWindow.orderBy]] is semantically identical to the
  * unpartitioned window (one partition, same total order, same frame
  * semantics) but declares the intent with an explicit constant
  * partition key, so WindowExec's partitionSpec is non-empty and the
  * accidental-global-window WARN stays meaningful. Use it ONLY when a
  * comment at the call site states the bound.
  */
object BoundedWindow {

  /** Catalyst's `EliminateWindowPartitions` strips foldable partition
    * keys, which would silently turn the declared constant key back
    * into an empty partitionSpec (and re-fire the WARN). Every session
    * builder in this engine excludes that one rule — it only ever
    * touches plans with constant partition keys, which only this
    * object creates, deliberately. */
  val ExcludedRule =
    "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions"

  /** One explicit partition (constant key) + total order. */
  def orderBy(cols: Column*): WindowSpec =
    Window.partitionBy(lit(0)).orderBy(cols: _*)

  /** One explicit partition, no order (whole-frame aggregates over a
    * bounded row set — the `sum(x).over(partitionBy())` shape). */
  def all: WindowSpec = Window.partitionBy(lit(0))
}
