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
    // ADVICE r16: the top-k variant had the same bug class via its
    // trace/wRow/defl ungrouped aggs — element_at(w, 0) threw
    assert(Quantize.embeddingPcaTopK(empty).count() === 0L)
  }

  test("top-k deflation recovers two planted directions in eigenvalue order, orthogonal") {
    // strong direction u1 = (0.6 on dim 2, -0.8 on dim 5), weaker
    // u2 = (1.0 on dim 9) at ~half the amplitude; all other dims carry
    // a deterministic low-amplitude wiggle
    val d = Quantize.PcaDim
    val rows = (0 until 512).map { r =>
      val t1 = (r % 32) - 15.5
      val t2 = ((r / 32) % 16) - 7.5
      val vec = Array.tabulate(d) { i =>
        val noise = 0.01f * (((r * 31 + i * 17) % 7) - 3)
        if (i == 2) (0.6 * t1).toFloat + noise
        else if (i == 5) (-0.8 * t1).toFloat + noise
        else if (i == 9) t2.toFloat + noise
        else noise
      }
      (r.toLong, vec.toSeq)
    }.toDF("vec_id", "embedding")
    val out = Quantize.embeddingPcaTopK(rows, 4)
      .select("component", "dim", "loading", "eigenvalue", "explained_share")
      .as[(Int, Int, Double, Double, Double)].collect()
    val byComp = out.groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    // each component unit-norm
    (0 until 4).foreach { c =>
      val n2 = byComp(c).values.map(x => x * x).sum
      assert(math.abs(n2 - 1.0) < 1e-6, s"comp $c norm² $n2")
    }
    // component 0 = the strong direction (sign-pinned: dim5 positive)
    assert(math.abs(byComp(0)(5) - 0.8) < 0.02, s"c0 dim5 ${byComp(0)(5)}")
    assert(math.abs(byComp(0)(2) + 0.6) < 0.02, s"c0 dim2 ${byComp(0)(2)}")
    // component 1 = the planted dim-9 direction
    assert(math.abs(math.abs(byComp(1)(9)) - 1.0) < 0.02,
      s"c1 dim9 ${byComp(1)(9)}")
    // orthogonality across the deflation: residual cross-talk is the
    // 6-round power-iteration convergence error, not exact zero — the
    // gap-4 planted pair bounds at 1e-2; components 2-3 live in the
    // fixture's near-degenerate noise floor where iteration converges
    // slowly, so their cross-terms get the looser 5e-2
    for (a <- 0 until 4; b <- a + 1 until 4) {
      val dot = (0 until d).map(i => byComp(a)(i) * byComp(b)(i)).sum
      val bound = if (b <= 1) 1e-2 else 5e-2
      assert(math.abs(dot) < bound, s"components $a,$b dot $dot")
    }
    // eigenvalues non-increasing; shares bounded
    val evs = out.groupBy(_._1).view.mapValues(_.head._4).toMap
    assert(evs(0) > evs(1) && evs(1) > evs(2),
      s"spectrum not ordered: $evs")
    val shares = out.groupBy(_._1).view.mapValues(_.head._5).toMap
    assert(shares.values.forall(s => s > 0 && s <= 1.0))
    assert(shares.values.sum <= 1.0 + 1e-9)
  }

  test("pcaProject rotates onto the basis: planted coordinates recovered") {
    val d = Quantize.PcaDim
    val rows = (0 until 256).map { r =>
      val t = (r % 32) - 15.5
      val vec = Array.tabulate(d) { i =>
        val noise = 0.01f * (((r * 31 + i * 17) % 7) - 3)
        if (i == 2) (0.6 * t).toFloat + noise
        else if (i == 5) (-0.8 * t).toFloat + noise
        else noise
      }
      (r.toLong, vec.toSeq)
    }.toDF("vec_id", "embedding")
    val pca = Quantize.embeddingPcaTopK(rows, 2)
    val proj = Quantize.pcaProject(rows, pca)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    assert(proj.forall(_._2.length === 2))
    // first projected coordinate ~ u1·x = -(0.6·x2) + 0.8·x5 = -t
    // (sign pin makes dim5 positive -> loading (-0.6, 0.8))
    proj.foreach { case (id, y) =>
      val t = (id % 32) - 15.5
      assert(math.abs(y(0) - (-t)) < 0.2, s"vec $id y0 ${y(0)} vs ${-t}")
    }
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
