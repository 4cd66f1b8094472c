package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) curve key: interleave the low 16 bits of two
  * bucket indexes into one 32-bit key whose sort order clusters BOTH
  * dimensions at once (SURVEY §7.3 escape hatch (b)).
  *
  * Why: parquet data skipping is min/max-range based, and a sort on
  * one column destroys locality on every other. Writing files sorted
  * by the Morton key of (dim A bucket, dim B bucket) gives each file a
  * narrow min/max range on BOTH dimensions, so range predicates on
  * either one (or both) prune files/row-groups — the layout trick
  * Delta OPTIMIZE ZORDER BY applies, here as a plain codegen'd
  * expression usable with `repartitionByRange(zkey) +
  * sortWithinPartitions(zkey)` before any parquet write
  * (ZOrderSpec asserts the per-file span contraction).
  *
  * Bit-spread is the standard mask ladder (exactly mirrored in the
  * DuckDB oracle's arithmetic):
  *   x &= 0xFFFF; x = (x|(x<<8)) & 0x00FF00FF; (x|(x<<4)) & 0x0F0F0F0F;
  *   (x|(x<<2)) & 0x33333333; (x|(x<<1)) & 0x55555555
  *   z = spread(x) | spread(y) << 1
  */
case class InterleaveBits16(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_key needs two bigint bucket indexes, got " +
        s"${left.dataType}, ${right.dataType}")

  private def spread(v0: Long): Long = {
    var x = v0 & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      def ladder(v: String): String =
        s"""$v &= 0xFFFFL;
           |$v = ($v | ($v << 8)) & 0x00FF00FFL;
           |$v = ($v | ($v << 4)) & 0x0F0F0F0FL;
           |$v = ($v | ($v << 2)) & 0x33333333L;
           |$v = ($v | ($v << 1)) & 0x55555555L;""".stripMargin
      s"""
         |long $x = $a;
         |long $y = $b;
         |${ladder(x)}
         |${ladder(y)}
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)

  override def prettyName: String = "zorder_key"
}

object ZOrder {
  /** Morton key of two bigint bucket columns (low 16 bits each). */
  def zorder_key(a: Column, b: Column): Column =
    Bridge.column(InterleaveBits16(Bridge.expression(a), Bridge.expression(b)))

  /** The same mask ladder as DuckDB SQL, for oracle parity. */
  def spreadSql(e: String): String = {
    val s0 = s"(($e) & 65535)"
    val s1 = s"(($s0 | ($s0 << 8)) & 16711935)"
    val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
    val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
    s"(($s3 | ($s3 << 1)) & 1431655765)"
  }
  def zorderSql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"
}
