package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.expressions.VectorExprs

/** Specs for the native vector expressions: the codegen'd loop must be
  * bit-identical to both the interpreted eval and the higher-order
  * `aggregate(zip_with(...))` fold it replaced. */
class VectorExprsSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf).limit(50)

  test("dot_product codegen == sequential HOF fold, bit-exact") {
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val bad = emb.select(
        VectorExprs.dot_product(col("embedding"), col("embedding")).as("native"),
        hof.as("fold"))
      .filter(col("native") =!= col("fold")).count()
    assert(bad === 0)
  }

  test("dot_product interpreted eval matches codegen") {
    val rows = emb.select(col("embedding"),
      VectorExprs.dot_product(col("embedding"), col("embedding")).as("d")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      var acc = 0.0
      v.foreach(x => acc += x.toDouble * x.toDouble)
      assert(r.getDouble(1) === acc)
    }
  }

  test("signed_projection matches the SQL-formula fold") {
    def sgn(k: Int, i: Column) =
      when((i.cast("long") * 2654435761L + lit(k.toLong * 40503L)) % 97 < 48, lit(-1.0))
        .otherwise(lit(1.0))
    def fold(k: Int) = aggregate(
      transform(sequence(lit(1), size(col("embedding"))),
        i => sgn(k, i) * element_at(col("embedding"), i).cast("double")),
      lit(0.0), (acc, x) => acc + x)
    (0 until 4).foreach { k =>
      val bad = emb.select(
          VectorExprs.signed_projection(col("embedding"), k).as("native"),
          fold(k).as("fold"))
        .filter(col("native") =!= col("fold")).count()
      assert(bad === 0, s"k=$k")
    }
  }

  test("dot_product_long == the aggregate(zip_with) fold it replaced, bit-exact") {
    // the serving-path vectors are long arrays; build them the same way
    val vecs = llm.HashEmbed.vectors(llm.HashEmbed.hashedEmbeddings(
      Tables.documents(spark, sf).limit(50)))
    val hof = aggregate(zip_with(col("vec"), col("vec"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val bad = vecs.select(
        VectorExprs.dot_product_long(col("vec"), col("vec")).as("native"),
        hof.as("fold"))
      .filter(col("native") =!= col("fold")).count()
    assert(bad === 0)
  }

  test("self_outer_products == the nested transform form it replaced, row for row") {
    val qv = emb.select(col("vec_id"),
      transform(col("embedding"), x =>
        floor(x.cast("double") * lit(llm.Quantize.CorrQuant) + lit(0.5)).cast("long")).as("q"))
    val old = qv.select(col("vec_id"), explode(flatten(
        transform(sequence(lit(0), size(col("q")) - 1), i =>
          transform(sequence(i, size(col("q")) - 1), j =>
            struct(i.cast("int").as("i"), j.cast("int").as("j"),
              (element_at(col("q"), (i + 1).cast("int")) *
                element_at(col("q"), (j + 1).cast("int"))).as("xy"))))))
        .as("p"))
    val neu = qv.select(col("vec_id"),
      explode(VectorExprs.self_outer_products(col("q"))).as("p"))
    assert(neu.exceptAll(old).count() === 0)
    assert(old.exceptAll(neu).count() === 0)
  }

  test("null arrays propagate null") {
    val df = emb.select(
      VectorExprs.dot_product(lit(null).cast("array<float>"), col("embedding")).as("d"))
    assert(df.filter(col("d").isNotNull).count() === 0)
  }

  test("centered_sem_bands matches the unrolled column formula it replaced") {
    import graft.llm.HashEmbed.{Dim, SemBandBits, SemBands}
    val vecs = graft.llm.HashEmbed.vectors(graft.llm.HashEmbed.hashedEmbeddings(
      Tables.documents(spark, sf).limit(200)))
    val stats = graft.llm.HashEmbed.semStats(vecs)
    // the pre-CenteredSemBands column unroll, verbatim
    def sgn(k: Int, i: Int): Long =
      if ((i.toLong * 2654435761L + k.toLong * 40503L) % 97L < 48L) -1L else 1L
    def proj(k: Int): Column =
      (1 to Dim).map(i => lit(sgn(k, i)) *
        (col("n") * element_at(col("vec"), i) - element_at(col("svec"), i))).reduce(_ + _)
    val unrolled = (0 until SemBands).map { b =>
      (0 until SemBandBits).map { j =>
        when(proj(b * SemBandBits + j) > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val both = vecs.crossJoin(broadcast(stats)).select(col("doc_id"),
      VectorExprs.centered_sem_bands(col("vec"), col("n"), col("svec"),
        SemBands, SemBandBits).as("native"),
      array(unrolled: _*).as("unrolled"))
    assert(both.filter(col("native") =!= col("unrolled")).count() === 0)
    // non-degenerate: buckets actually split the sample
    assert(both.select(explode(col("native"))).distinct().count() > 4)
  }
}
