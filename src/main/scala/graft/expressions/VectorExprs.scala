package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}
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

  /** Shared eval of [[DotProductLong]] (interpreted + codegen paths):
    * exact long dot in index order, REJECTING unequal lengths and
    * null elements loudly (ADVICE r18 — the fold it replaces would
    * null-propagate; a silent 0/truncation here is a wrong answer). */
  def dotLong(x: ArrayData, y: ArrayData): Long = {
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"dot_product_long: unequal vector lengths $n vs ${y.numElements()}")
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i))
        throw new IllegalArgumentException(
          s"dot_product_long: null element at index $i")
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

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

  /** ALL [[graft.llm.HashEmbed]] semantic-band buckets of one centered
    * long vector in one pass: bucket(b) = Σ_j (1<<j)·[p_{b·bits+j} > 0]
    * with p_k = Σ_i sgn(k,i)·(n·vec[i] − svec[i]) (1-based i), sgn as in
    * [[SignedProjection]]. The column-unrolled form of this (bands ×
    * bits × dim element_at/multiply nodes ≈ 4000-node tree) cost ~1.7 s
    * of CATALYST RE-PLANNING per execution — dominating every streaming
    * micro-batch of the hybrid-index maintenance loop; this expression
    * is a handful of plan nodes and one tight integer loop. Pure Long
    * arithmetic, order-free sums — bit-identical to the unrolled form
    * and to the DuckDB mirror. */
  case class CenteredSemBands(vec: Expression, n: Expression, svec: Expression,
                              bands: Int, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
    override def first: Expression = vec
    override def second: Expression = n
    override def third: Expression = svec
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = (vec.dataType, n.dataType, svec.dataType) match {
        case (ArrayType(LongType, _), LongType, ArrayType(LongType, _)) => true
        case _ => false
      }
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"centered_sem_bands needs (array<bigint>, bigint, array<bigint>), " +
          s"got (${vec.dataType}, ${n.dataType}, ${svec.dataType})")
    }

    override def nullSafeEval(v: Any, nn: Any, s: Any): Any = {
      val x = v.asInstanceOf[ArrayData]; val cnt = nn.asInstanceOf[Long]
      val sv = s.asInstanceOf[ArrayData]
      val dim = math.min(x.numElements(), sv.numElements())
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var bkt = 0L
        var j = 0
        while (j < bits) {
          val k = b * bits + j
          val kTerm = k.toLong * 40503L
          var p = 0L
          var i = 0
          while (i < dim) {
            val m = ((i + 1).toLong * 2654435761L + kTerm) % 97L
            val sgn = if (m < 48L) -1L else 1L
            p += sgn * (cnt * x.getLong(i) - sv.getLong(i))
            i += 1
          }
          if (p > 0L) bkt |= (1L << j)
          j += 1
        }
        out(b) = bkt
        b += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, nn, s) => {
        val dim = ctx.freshName("dim"); val out = ctx.freshName("out")
        val b = ctx.freshName("b"); val j = ctx.freshName("j")
        val k = ctx.freshName("k"); val p = ctx.freshName("p")
        val i = ctx.freshName("i"); val m = ctx.freshName("m")
        val bkt = ctx.freshName("bkt")
        s"""
           |int $dim = java.lang.Math.min($v.numElements(), $s.numElements());
           |long[] $out = new long[$bands];
           |for (int $b = 0; $b < $bands; $b++) {
           |  long $bkt = 0L;
           |  for (int $j = 0; $j < $bits; $j++) {
           |    long $k = (long) ($b * $bits + $j);
           |    long $p = 0L;
           |    for (int $i = 0; $i < $dim; $i++) {
           |      long $m = (($i + 1L) * 2654435761L + $k * 40503L) % 97L;
           |      $p += ($m < 48L ? -1L : 1L) * ($nn * $v.getLong($i) - $s.getLong($i));
           |    }
           |    if ($p > 0L) $bkt |= (1L << $j);
           |  }
           |  $out[$b] = $bkt;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(f: Expression, sec: Expression,
                                                   t: Expression): Expression =
      copy(vec = f, n = sec, svec = t)
  }

  /** Σ a[i]·b[i] over LONG arrays in long arithmetic, index order —
    * the integer twin of [[DotProduct]] for the hashed-embedding
    * serving path, where the composable `aggregate(zip_with(...))`
    * fold evaluates two interpreted lambdas per element per candidate
    * row. Integer adds are order-free, so the value is identical to
    * the fold (and to the DuckDB mirror) bit-for-bit. */
  case class DotProductLong(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product_long needs two array<bigint> inputs, got ${left.dataType}, ${right.dataType}")
    }

    // ADVICE r18: the fold this replaces null-pads unequal lengths and
    // null-propagates null elements; silently truncating/zeroing here
    // would diverge on irregular inputs. The declared-type lattice
    // cannot exclude them (transform(...cast) infers containsNull=true
    // even for never-null lambdas), so the contract is enforced at
    // runtime: unequal lengths and null elements FAIL LOUDLY. The
    // serving vectors are fixed-dim and non-null, so nothing real pays.
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      VectorExprs.dotLong(x, y)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.expressions.VectorExprs.dotLong($a, $b);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** All upper-triangle self outer products of one long vector in one
    * pass: struct(i, j, q[i]·q[j]) for 0 ≤ i ≤ j < n, in (i, j) row
    * order. The composable form — nested `transform(sequence(...))`
    * building ~n²/2 structs through interpreted HOF lambdas with two
    * `element_at` tree evaluations each — cost `embedding_corr` ~2 s
    * of expression interpretation per pass at sf0.1 (4.16 M struct
    * allocations); this is one tight primitive loop per row. Products
    * are exact int64 (same overflow envelope as the previous
    * element_at multiply), emitted in the same order, so the grouped
    * Σxy sums are bit-identical. */
  case class SelfOuterProducts(child: Expression) extends UnaryExpression {
    private val structType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("j",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("xy", LongType, nullable = false)))
    override def dataType: DataType = ArrayType(structType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"self_outer_products needs an array<bigint> input, got $t")
      }

    // ADVICE r18: the element_at form this replaces null-propagates a
    // null slot; getLong would silently read 0. The declared type
    // cannot exclude nulls (transform(...cast) infers
    // containsNull=true even for never-null lambdas — embeddingCorr's
    // own quantizer does), so the bit-identity contract is enforced at
    // runtime: a null element FAILS LOUDLY instead of zeroing.
    override def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val n = x.numElements()
      var c = 0
      while (c < n) {
        if (x.isNullAt(c))
          throw new IllegalArgumentException(
            s"self_outer_products: null element at index $c")
        c += 1
      }
      val out = new Array[Any](n * (n + 1) / 2)
      var k = 0
      var i = 0
      while (i < n) {
        val qi = x.getLong(i)
        var j = i
        while (j < n) {
          out(k) = org.apache.spark.sql.catalyst.InternalRow(i, j, qi * x.getLong(j))
          k += 1
          j += 1
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n"); val out = ctx.freshName("out")
        val k = ctx.freshName("k"); val i = ctx.freshName("i")
        val j = ctx.freshName("j"); val qi = ctx.freshName("qi")
        s"""
           |int $n = $a.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i)) {
           |    throw new IllegalArgumentException(
           |      "self_outer_products: null element at index " + $i);
           |  }
           |}
           |Object[] $out = new Object[$n * ($n + 1) / 2];
           |int $k = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  long $qi = $a.getLong($i);
           |  for (int $j = $i; $j < $n; $j++) {
           |    $out[$k++] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
           |      new Object[]{$i, $j, $qi * $a.getLong($j)});
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def signed_projection(v: Column, k: Int): Column =
    Bridge.column(SignedProjection(Bridge.expression(v), k))
  def self_outer_products(v: Column): Column =
    Bridge.column(SelfOuterProducts(Bridge.expression(v)))
  def dot_product_long(a: Column, b: Column): Column =
    Bridge.column(DotProductLong(Bridge.expression(a), Bridge.expression(b)))
  def centered_sem_bands(vec: Column, n: Column, svec: Column,
                         bands: Int, bits: Int): Column =
    Bridge.column(CenteredSemBands(Bridge.expression(vec), Bridge.expression(n),
      Bridge.expression(svec), bands, bits))
}
