package graft

import org.apache.spark.sql.functions._
import graft.llm.Quantize

/** Quantize.embeddingCorr: hand-checked correlations on a tiny basis,
  * zero-variance null contract, and the int64 headroom promised by the
  * Scaladoc on the gated corpus. */
class EmbeddingCorrSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("perfect correlation, diagonal, and zero-variance nulls") {
    // dim1 = 2·dim0 (r = 1); dim2 constant zero (degenerate)
    val m = Quantize.embeddingCorr(vecs(
      1L -> Seq(1f, 2f, 0f), 2L -> Seq(2f, 4f, 0f), 3L -> Seq(3f, 6f, 0f)))
      .collect().map(r => ((r.getAs[Int]("dim_i"), r.getAs[Int]("dim_j")), r))
      .toMap
    assert(m.size === 6) // 3·4/2 pairs, i <= j only
    val r01 = m((0, 1))
    assert(r01.getAs[Long]("n") === 3L)
    assert(r01.getAs[Long]("s_x") === 6000000L)
    assert(r01.getAs[Long]("s_xy") === 28L * 1000000L * 1000000L)
    // identical IEEE tree computed here
    val num = (3L * 28000000000000L - 6000000L * 12000000L).toDouble
    val expected = num / (math.sqrt((3L * 14000000000000L - 6000000L * 6000000L).toDouble) *
      math.sqrt((3L * 56000000000000L - 12000000L * 12000000L).toDouble))
    assert(r01.getAs[Double]("pearson_r") === expected)
    // any pair touching the constant dim is null, never NaN
    Seq((0, 2), (1, 2), (2, 2)).foreach { p =>
      assert(m(p).isNullAt(m(p).fieldIndex("pearson_r")))
    }
  }

  test("diagonal r ~ 1, pair count is D(D+1)/2, and headroom holds on gated data") {
    val emb = Tables.embeddings(spark, sf)
    val out = Quantize.embeddingCorr(emb).cache()
    val d = emb.select(size(col("embedding"))).as[Int].head()
    assert(out.count() === d.toLong * (d + 1) / 2)
    assert(out.filter(col("dim_i") === col("dim_j") &&
      abs(col("pearson_r") - 1.0) > 1e-12).count() === 0)
    // int64 headroom: n·maxq² (for n·Σxy) and (n·maxq)² (for Σx·Σy)
    val n = emb.count()
    val maxq = out.agg(max(greatest(abs(col("s_x")), abs(col("s_y")))))
      .as[Long].head() // |Σx| ≤ n·maxq, the tighter observable bound
    assert(BigInt(n) * BigInt(maxq) < BigInt(Long.MaxValue) / 4,
      s"n=$n max|s|=$maxq — widen the moment sums to decimal(38,0)")
    out.unpersist()
  }
}
