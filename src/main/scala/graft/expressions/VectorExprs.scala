package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.graftbridge.Bridge

/** Native Catalyst expressions for the embedding hot path (SURVEY §7.3
  * escape hatch (b): custom `Expression` before UDFs).
  *
  * The composable alternative — `aggregate(zip_with(...))` — is a
  * higher-order function: Catalyst evaluates the lambda per element,
  * interpreted, outside whole-stage codegen. These expressions generate
  * a tight primitive loop instead (`doGenCode`), with an interpreted
  * `nullSafeEval` fallback, while accumulating in EXACTLY the same
  * left-to-right element order as the fold they replace — so results
  * stay bit-identical to the DuckDB oracle's `list_reduce`.
  */
object VectorExprs {

  /** Σ a[i]·b[i] over float arrays, accumulated in double, index order. */
  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      // element type must be FLOAT exactly (containsNull irrelevant):
      // eval reads via getFloat, so an array<double>/array<long> input
      // would silently produce garbage instead of failing analysis
      // (ADVICE r2).
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product needs two array<float> inputs, got ${left.dataType}, ${right.dataType}")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Σ sgn(k,i)·v[i] — the deterministic-hyperplane projection used by
    * the LSH bucketer; sgn(k,i) = −1 iff (i·2654435761 + k·40503) mod 97
    * < 48 with 1-based i, identical to the SQL formula in the oracle. */
  case class SignedProjection(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"signed_projection needs an array<float> input, got $t")
      }

    override def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val n = x.numElements()
      val kTerm = k.toLong * 40503L
      var acc = 0.0
      var i = 0
      while (i < n) {
        val m = ((i + 1).toLong * 2654435761L + kTerm) % 97L
        val sgn = if (m < 48L) -1.0 else 1.0
        acc += sgn * x.getFloat(i).toDouble
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val acc = ctx.freshName("acc"); val m = ctx.freshName("m")
        s"""
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  long $m = (($i + 1L) * 2654435761L + ${k.toLong * 40503L}L) % 97L;
           |  $acc += ($m < 48L ? -1.0 : 1.0) * ((double) $a.getFloat($i));
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def signed_projection(v: Column, k: Int): Column =
    Bridge.column(SignedProjection(Bridge.expression(v), k))
}
