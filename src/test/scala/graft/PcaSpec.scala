package graft

import org.apache.spark.sql.functions._
import graft.llm.Quantize

/** Quantize.embeddingPca: the quantized power iteration recovers a
  * planted dominant direction, the loading vector is unit-norm with
  * the sign pin applied, and the eigenvalue/share match the planted
  * spectrum. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("recovers a planted dominant direction with pinned sign") {
    // x = t·u + small structured noise, u = (3/5 on dim 2, -4/5 on
    // dim 5): variance along u dominates; every other dim carries a
    // deterministic low-amplitude wiggle so no dimension is constant
    val d = Quantize.PcaDim
    val rows = (0 until 512).map { r =>
      val t = (r % 32) - 15.5 // mean-0 spread along u
      val vec = Array.tabulate(d) { i =>
        val noise = 0.01f * (((r * 31 + i * 17) % 7) - 3)
        if (i == 2) (0.6 * t).toFloat + noise
        else if (i == 5) (-0.8 * t).toFloat + noise
        else noise
      }
      (r.toLong, vec.toSeq)
    }.toDF("vec_id", "embedding")
    val out = Quantize.embeddingPca(rows)
      .select("dim", "loading", "explained_share")
      .as[(Int, Double, Double)].collect()
    val byDim = out.map(r => r._1 -> r._2).toMap
    // unit norm
    val n2 = out.map(r => r._2 * r._2).sum
    assert(math.abs(n2 - 1.0) < 1e-9, s"norm² $n2")
    // direction: ±(0.6, −0.8) on dims 2/5, sign pinned so the
    // largest-|coordinate| (dim 5) is positive → loadings (−0.6, 0.8)
    assert(math.abs(byDim(5) - 0.8) < 0.01, s"dim5 ${byDim(5)}")
    assert(math.abs(byDim(2) + 0.6) < 0.01, s"dim2 ${byDim(2)}")
    out.filter(r => r._1 != 2 && r._1 != 5)
      .foreach(r => assert(math.abs(r._2) < 0.05, s"dim ${r._1}: ${r._2}"))
    // the planted direction owns nearly all the variance
    assert(out.head._3 > 0.95, s"share ${out.head._3}")
  }

  test("empty corpus yields zero rows, not sequence(1,0) garbage") {
    // ADVICE r15: Spark's sequence(1, size(aa)) at size 0 infers a
    // descending step ([1,0]) — without the n > 0 guard an empty
    // corpus emitted 2 garbage rows while DuckDB returned none
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Quantize.embeddingPca(empty).count() === 0L)
  }

  test("real corpus: unit norm, positive spectrum, bounded share") {
    val out = Models.embeddingPca(spark, sf)
      .select("loading", "loading_q", "eigenvalue", "explained_share")
      .as[(Double, Long, Double, Double)].collect()
    assert(out.length === Quantize.PcaDim)
    val n2 = out.map(r => r._1 * r._1).sum
    assert(math.abs(n2 - 1.0) < 1e-9)
    out.foreach { case (l, lq, ev, sh) =>
      assert(lq === math.floor(l * Quantize.CorrQuant + 0.5).toLong)
      assert(ev > 0.0)
      // top-PC share is at least the isotropic floor 1/D
      assert(sh >= 1.0 / Quantize.PcaDim && sh <= 1.0)
    }
  }
}
