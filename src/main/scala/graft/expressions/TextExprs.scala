package graft.expressions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Native expression for the shared 60-bit md5 hash primitive
  * (Dedup.hex60): `conv(substring(md5(x), 1, 15), 16, 10)` composed
  * from built-ins allocates a 32-char hex string, a 15-char substring,
  * and a radix-parse per call — and the MinHash path calls it 16 times
  * per shingle. This expression goes digest → long directly: the first
  * 15 hex digits of an md5 are the top 60 bits of its first 8 bytes,
  * so the value is the big-endian 8-byte prefix shifted right 4 —
  * bit-identical to the composed form (Md5Prefix60Spec proves it on
  * arbitrary strings), which keeps the DuckDB oracle unchanged.
  */
object TextExprs {

  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(utf8) as a non-negative long. */
  def md5Prefix60(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val top =
      (d(0) & 0xFFL) << 56 | (d(1) & 0xFFL) << 48 | (d(2) & 0xFFL) << 40 |
        (d(3) & 0xFFL) << 32 | (d(4) & 0xFFL) << 24 | (d(5) & 0xFFL) << 16 |
        (d(6) & 0xFFL) << 8 | (d(7) & 0xFFL)
    top >>> 4
  }

  case class Md5Prefix60(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"md5_prefix60 needs a string input, got $t")
    }

    override def nullSafeEval(s: Any): Any =
      md5Prefix60(s.asInstanceOf[UTF8String])

    // stays inside whole-stage codegen: the generated code is a single
    // static call (the same shape built-in Md5 uses for DigestUtils).
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.expressions.TextExprs.md5Prefix60($c)")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def md5_prefix60(c: Column): Column = Bridge.column(Md5Prefix60(Bridge.expression(c)))

  private val HexDigits = "0123456789abcdef".getBytes("US-ASCII")

  /** Full 32-char lowercase md5 hex — byte-identical to built-in
    * `md5()`, which routes through commons-codec `DigestUtils.md5Hex`
    * (a fresh MessageDigest + char[]→String per row). This reuses the
    * thread-local digest and writes the hex bytes straight into a
    * UTF8String; the surrogate-key path evaluates it once per staged
    * row (600 k lineitems at sf0.1 — md5 was ~half of
    * stg_order_items' execution, measured r18). */
  def md5Hex(s: UTF8String): UTF8String = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HexDigits(d(i) & 0xF)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  case class Md5Hex(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"md5_hex needs a string input, got $t")
    }

    override def nullSafeEval(s: Any): Any =
      md5Hex(s.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.expressions.TextExprs.md5Hex($c)")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def md5_hex(c: Column): Column = Bridge.column(Md5Hex(Bridge.expression(c)))
}
