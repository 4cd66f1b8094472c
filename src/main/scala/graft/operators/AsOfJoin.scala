package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the time-series primitive Spark has no built-in
  * operator for (the brief's canonical example): for every left row
  * (key, t), attach the payload of the LATEST right row with the same
  * key and time ≤ t.
  *
  * The naive formulations do not scale: a non-equi self-join explodes
  * to O(|left| × |right per key|) candidate pairs before the argmax,
  * and a correlated subquery re-scans the right side per left row.
  * This is the single-shuffle form:
  *
  *   1. UNION both sides, tagged: right rows carry the payload, left
  *      rows carry null payload + their own row struct;
  *   2. one keyed window sorted by (time, side, tiebreak) — side
  *      orders a right row BEFORE a left row at the same instant, so
  *      "≤" semantics fall out of the sort;
  *   3. `last(payload, ignoreNulls)` with an unbounded-preceding frame
  *      propagates the most recent right payload onto every left row —
  *      a running O(1)-state pass, no pair blowup;
  *   4. keep the left rows, unwrap their struct.
  *
  * Scale: ONE shuffle on the key (both inputs), then a linear sorted
  * pass per partition. Key cardinality is the parallelism; a key's
  * rows must fit a partition's sort spill budget — the same contract
  * as any keyed window. Deterministic for any input: the sort is
  * totalized by the caller-supplied unique right tiebreak (ties among
  * LEFT rows are harmless — each left row's result depends only on
  * the right rows ordered before it).
  */
object AsOfJoin {

  /** `left ⟕asof right` on `key`: latest right row with
    * `right(rightTime) <= left(leftTime)`. `payload`: right columns to
    * attach (all null when no right row precedes). `rightTieBreak`:
    * unique right column (any orderable type) totalizing the order
    * among equal-time right rows — the largest wins, matching
    * "latest". Left rows need no tiebreak: at equal time the side tag
    * already orders every right row before every left row, and
    * left-left order cannot affect any left row's answer.
    *
    * The payload travels as ONE struct, not per-column windows: the
    * matched right row is attached atomically, so a null FIELD in the
    * latest right row stays null instead of being back-filled from an
    * older row (which would fabricate a composite row that never
    * existed). */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               payload: Seq[String], rightTieBreak: String): DataFrame =
    asof(left, right, key, leftTime, rightTime, payload, rightTieBreak,
      forward = false)

  /** Forward as-of: EARLIEST right row with `right(rightTime) >=
    * left(leftTime)` — the mirror of [[backward]] ("what happens next
    * after this event"): the side tag flips so an equal-time right row
    * sorts AFTER the left rows (">=" inclusion), the frame flips to
    * current-row→unbounded-following, `first` replaces `last`, and the
    * SMALLEST tiebreak wins among equal-time right rows ("earliest").
    * Same single-shuffle scale shape. */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              payload: Seq[String], rightTieBreak: String): DataFrame =
    asof(left, right, key, leftTime, rightTime, payload, rightTieBreak,
      forward = true)

  private def asof(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String,
                   payload: Seq[String], rightTieBreak: String,
                   forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val shared = leftCols.filterNot(_ == key).toSet
      .intersect(payload.toSet)
    require(shared.isEmpty,
      s"payload columns collide with left columns: ${shared.mkString(", ")} " +
        "(alias the right side before joining)")
    val tbType = right.schema(rightTieBreak).dataType
    // backward: right rows sort BEFORE left rows at equal time ("<=")
    // and the LATEST preceding right row wins (last over a preceding
    // frame, largest tiebreak last). forward: right rows sort AFTER
    // left rows at equal time (">=") and the EARLIEST following right
    // row wins (first over a following frame, smallest tiebreak first).
    val (rightSide, leftSide) = if (forward) (1, 0) else (0, 1)
    val rightRows = right.select(
      col(key), col(rightTime).as("__t"), lit(rightSide).as("__side"),
      col(rightTieBreak).as("__tb"),
      struct(payload.map(col): _*).as("__p"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        left.schema.fields.filterNot(_.name == key))).as("__l"))
    val leftRows = left.select(
      col(key), col(leftTime).as("__t"), lit(leftSide).as("__side"),
      lit(null).cast(tbType).as("__tb"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        payload.map(p => right.schema(p)).toArray)).as("__p"),
      struct(leftCols.filterNot(_ == key).map(col): _*).as("__l"))
    // left rows' null __tb never ties with a right row (the side tag
    // differs), so one null ordering serves both directions
    val wBase = Window.partitionBy(key)
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc_nulls_last)
    val (w, pick) =
      if (forward)
        (wBase.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("__p"), ignoreNulls = true))
      else
        (wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("__p"), ignoreNulls = true))
    rightRows.unionByName(leftRows)
      .select(col(key), col("__side"), col("__l"), pick.over(w).as("__p"))
      .filter(col("__side") === leftSide)
      .select(col(key) +:
        leftCols.filterNot(_ == key).map(c => col(s"__l.$c").as(c)) ++:
        payload.map(p => col(s"__p.$p").as(p)): _*)
  }
}
