package graft

import org.apache.spark.sql.functions._
import graft.llm.Quantize

/** Int8 scalar quantization: code-range/limit invariants, the
  * reconstruction error bound the scheme guarantees, and recall of the
  * dequantized search against the exact top-k on real testdata.
  */
class QuantizeSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf)

  test("codes are int8-ranged and extremes map to ±127") {
    import spark.implicits._
    val q = Quantize.quantize(
      Seq((1L, Seq(1.0f, -1.0f, 0.5f, 0.0f)),
          (2L, Seq(-2.0f, 1.0f, 0.25f, -0.25f)))
        .toDF("vec_id", "embedding"))
    val rows = q.orderBy("vec_id").collect()
    assert(rows(0).getAs[Seq[Int]]("qvec") === Seq(127, -127, 64, 0))
    // scale 2.0: -2→-127, 1→floor(63.5+0.5)=64, 0.25→floor(15.875+.5)=16
    assert(rows(1).getAs[Seq[Int]]("qvec") === Seq(-127, 64, 16, -16))
    assert(rows(1).getAs[Double]("scale") === 2.0)
  }

  test("zero vectors are dropped (scale > 0 guard)") {
    import spark.implicits._
    val q = Quantize.quantize(
      Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding"))
    assert(q.select("vec_id").as[Long].collect().toSeq === Seq(2L))
  }

  test("reconstruction error is bounded by scale/254 per component") {
    // max-abs symmetric int8: |x - x'| <= (scale/127)/2 per component
    val bad = Quantize.dequantize(Quantize.quantize(emb))
      .withColumnRenamed("embedding", "rec")
      .join(emb, Seq("vec_id"))
      .select(col("vec_id"),
        array_max(transform(col("embedding"), x => abs(x))).cast("double").as("s"),
        aggregate(
          zip_with(col("embedding"), col("rec"),
            (a, b) => abs(a.cast("double") - b.cast("double"))),
          lit(0.0), (acc, x) => greatest(acc, x)).as("max_err"))
      .filter(col("max_err") > col("s") / lit(254.0) * lit(1.0000001))
      .count()
    assert(bad === 0L)
  }

  test("dequantized search keeps high recall vs the exact top-k") {
    val exact = llm.Similarity.annCosineTopK(emb)
    val approx = Quantize.annSq8TopK(emb)
    val recall = llm.Similarity.annRecall(exact, approx)
      .agg(avg(col("recall"))).head().getDouble(0)
    // int8 on 64-dim unit-ish vectors loses almost nothing; anything
    // below this means the scheme (not the data) is broken
    assert(recall >= 0.8, s"mean recall@5 $recall")
  }

  test("annRecall counts overlap per query and never drops queries") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 11L), (1L, 99L), (2L, 98L), (2L, 99L))
      .toDF("query_id", "neighbor_id")
    val r = llm.Similarity.annRecall(exact, approx)
      .orderBy("query_id").collect()
    assert(r.map(_.getAs[Long]("n_hits")).toSeq === Seq(1L, 0L))
    // denominator is the query's ACTUAL exact-result size (2 here),
    // not the constant k — a short exact list must still allow 1.0
    assert(r(0).getAs[Double]("recall") === 0.5)
    assert(r(1).getAs[Double]("recall") === 0.0)
  }
}
