package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert curve index (Hilbert 1891; xy2d walk per Warren, Hacker's
  * Delight §16) of two 16-bit bucket indexes — the locality-preserving
  * sibling of [[ZOrder]]: unlike the Morton curve, consecutive Hilbert
  * positions are ALWAYS unit steps (no quadrant-boundary jumps), so a
  * Hilbert-sorted write gives each file a tighter bounding box on both
  * dimensions — the layout Delta's OPTIMIZE switched to for multi-dim
  * clustering. layout_locality gates the claim with a measured
  * files-scanned comparison against the Z-order zonemaps on the same
  * data and the same box predicates.
  *
  * Algorithm (top-down, 16 levels, subcube-local rotation):
  * for s = 2¹⁵ … 1: rx = (x&s)>0, ry = (y&s)>0;
  * d += s²·quadrant(rx,ry) with quadrant = (3·rx) XOR ry ∈ {0,1,2,3};
  * if ry=0 { if rx=1 { x,y = s−1−x, s−1−y }; swap(x,y) }.
  * Validated bijective + unit-step on full grids (HilbertSpec), and
  * mirrored LEVEL BY LEVEL in the DuckDB oracle as 16 chained CTE
  * steps of pure integer CASE arithmetic ([[Hilbert.sqlSteps]]) —
  * both engines walk the identical integer state machine.
  */
case class HilbertIndex16(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_key needs two bigint bucket indexes, got " +
        s"${left.dataType}, ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    Hilbert.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.Hilbert.xy2d($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)

  override def prettyName: String = "hilbert_key"
}

object Hilbert {

  /** Order-16 Hilbert index of (x, y) masked to 16 bits each. */
  def xy2d(x0: Long, y0: Long): Long = {
    var x = x0 & 0xFFFFL
    var y = y0 & 0xFFFFL
    var d = 0L
    var s = 1L << 15
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Hilbert key of two bigint bucket columns (low 16 bits each). */
  def hilbert_key(a: Column, b: Column): Column =
    Bridge.column(HilbertIndex16(Bridge.expression(a), Bridge.expression(b)))

  /** DuckDB mirror: 16 chained CTE steps advancing the same (x, y, d)
    * state machine one level each — pure integer CASE arithmetic, no
    * recursion, no xor (the quadrant map is enumerated). `from0` must
    * expose columns (x, y, d) plus the carried `keep` columns. Step k
    * handles s = 2^(15−k). */
  def sqlSteps(from0: String, keep: Seq[String]): String = {
    val ks = keep.mkString(", ")
    val steps = (0 until 16).map { k =>
      val s = 1L << (15 - k)
      s"""hstep$k as (
         |  select $ks,
         |    case when ((y & $s) > 0) or ((x & $s) = 0) then x
         |         else ${s - 1} - x end as nx0,
         |    case when ((y & $s) > 0) or ((x & $s) = 0) then y
         |         else ${s - 1} - y end as ny0,
         |    d + ${s * s} * (case
         |      when (x & $s) = 0 and (y & $s) = 0 then 0
         |      when (x & $s) = 0 then 1
         |      when (y & $s) > 0 then 2
         |      else 3 end) as d,
         |    (y & $s) = 0 as do_swap, x as px, y as py
         |  from ${if (k == 0) from0 else s"hout${k - 1}"}
         |),
         |hout$k as (
         |  select $ks,
         |    case when do_swap then ny0 else px end as x,
         |    case when do_swap then nx0 else py end as y,
         |    d
         |  from hstep$k
         |)""".stripMargin
    }
    steps.mkString(",\n")
  }
}
