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
    * after this event"), expressed as the SAME growing-frame running
    * pass over time REVERSED: sort (time desc, side, tiebreak desc) and
    * keep `last(payload)` over unbounded-preceding→current-row. In the
    * descending scan the most recent right row seen is the smallest
    * `rt >= t`, equal-time rights still sort before the left rows
    * (">=" inclusion), and tiebreak-desc makes the SMALLEST tiebreak
    * the last seen ("earliest" wins). Same single-shuffle shape AND the
    * same O(rows) frame as backward — a current-row→unbounded-following
    * frame would re-scan the partition tail per row, O(m²) on a hot
    * key (review r6). */
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
    // Both directions run the same growing-frame `last` pass; only the
    // sort direction flips. backward: time asc — the last right row
    // seen is the LATEST rt <= t, ties resolved largest-tiebreak-last.
    // forward: time desc — the last right row seen is the SMALLEST
    // rt >= t, ties resolved smallest-tiebreak-last. Rights sort
    // before lefts at equal time in both (inclusive semantics).
    val rightRows = right.select(
      col(key), col(rightTime).as("__t"), lit(0).as("__side"),
      col(rightTieBreak).as("__tb"),
      struct(payload.map(col): _*).as("__p"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        left.schema.fields.filterNot(_.name == key))).as("__l"))
    val leftRows = left.select(
      col(key), col(leftTime).as("__t"), lit(1).as("__side"),
      lit(null).cast(tbType).as("__tb"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        payload.map(p => right.schema(p)).toArray)).as("__p"),
      struct(leftCols.filterNot(_ == key).map(col): _*).as("__l"))
    // left rows' null __tb never ties with a right row (the side tag
    // differs), so one null ordering serves both directions
    val w = (if (forward)
        Window.partitionBy(key).orderBy(
          col("__t").desc, col("__side").asc, col("__tb").desc_nulls_last)
      else
        Window.partitionBy(key).orderBy(
          col("__t").asc, col("__side").asc, col("__tb").asc_nulls_last))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightRows.unionByName(leftRows)
      .select(col(key), col("__side"), col("__l"),
        last(col("__p"), ignoreNulls = true).over(w).as("__p"))
      .filter(col("__side") === 1)
      .select(col(key) +:
        leftCols.filterNot(_ == key).map(c => col(s"__l.$c").as(c)) ++:
        payload.map(p => col(s"__p.$p").as(p)): _*)
  }
}
