package graft

import org.apache.spark.sql.functions._
import graft.llm.{QualityModel, Splits}

/** QualityModel.conformal: the operator equals a driver-side
  * replication of split-conformal on a synthetic margin table (q̂ =
  * the ⌈(n+1)(1−α)⌉-th smallest label-directed score; sets, coverage,
  * sizes), and the real-corpus coverage respects the finite-sample
  * band around 1−α. */
class ConformalSpec extends SparkSpec {
  import spark.implicits._

  test("operator equals the driver-side reference on synthetic margins") {
    // margins spread around 0 with both labels on both sides, so the
    // sets are non-trivial at both alphas
    val pred = (0L until 400L).map { id =>
      val margin = (id % 37) * 997 - 18000 + (if (id % 3 == 0) 9000 else 0)
      val label = if ((id % 7) < 4) 1 else 0
      (id, label, margin)
    }.toDF("doc_id", "label", "margin")
    // replicate the split with the SAME device, collected driver-side
    val buckets = pred.select(col("doc_id"),
        Splits.saltedBucket(QualityModel.ConformalSalt, col("doc_id"), 4L)
          .as("b"), col("label"), col("margin"))
      .as[(Long, Long, Int, Long)].collect()
    val cal = buckets.filter(_._2 == 1L)
      .map { case (_, _, y, m) => if (y == 1) -m else m }.sorted
    val test = buckets.filter(_._2 == 2L)
    assert(cal.length > 20 && test.length > 20, "splits must be populated")
    val got = QualityModel.conformal(pred)
      .select("alpha", "n_cal", "qhat", "n_test", "n_covered", "n_empty",
        "n_full")
      .as[(Double, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    QualityModel.ConformalAlphas.foreach { alpha =>
      val k = math.ceil((cal.length + 1) * (1.0 - alpha)).toInt
      assert(k <= cal.length, "this fixture exercises the finite-qhat path")
      val qhat = cal(k - 1)
      val in1 = test.map { case (_, _, _, m) => -m <= qhat }
      val in0 = test.map { case (_, _, _, m) => m <= qhat }
      val covered = test.zipWithIndex.count { case ((_, _, y, _), i) =>
        if (y == 1) in1(i) else in0(i) }
      val empty = test.indices.count(i => !in1(i) && !in0(i))
      val full = test.indices.count(i => in1(i) && in0(i))
      val g = got(alpha)
      assert(g._2 === cal.length.toLong)
      assert(g._3 === qhat, s"alpha=$alpha qhat")
      assert(g._4 === test.length.toLong)
      assert(g._5 === covered.toLong, s"alpha=$alpha coverage count")
      assert(g._6 === empty.toLong)
      assert(g._7 === full.toLong)
    }
  }

  test("degenerate calibration split: NULL qhat, all sets full") {
    // ADVICE r15: when ceil((n_cal+1)(1-alpha)) > n_cal the standard
    // split-conformal q-hat is +infinity — the operator must surface
    // NULL qhat with every set full, not clamp to the max calibration
    // score. Build a fixture with exactly 5 calibration docs: at
    // alpha=0.1, k=6 > 5 (degenerate); at alpha=0.2, k=5 (finite).
    val buckets = (0L until 200L).toDF("doc_id")
      .select(col("doc_id"),
        Splits.saltedBucket(QualityModel.ConformalSalt, col("doc_id"), 4L)
          .as("b"))
      .as[(Long, Long)].collect()
    val calIds = buckets.filter(_._2 == 1L).map(_._1).take(5)
    val testIds = buckets.filter(_._2 == 2L).map(_._1).take(20)
    assert(calIds.length === 5 && testIds.length === 20)
    val pred = (calIds ++ testIds).zipWithIndex.map { case (id, i) =>
      (id, if (i % 2 == 0) 1 else 0, (i.toLong - 12L) * 1000L)
    }.toSeq.toDF("doc_id", "label", "margin")
    val rows = QualityModel.conformal(pred)
      .select("alpha", "n_cal", "qhat", "n_test", "coverage",
        "avg_set_size", "n_empty", "n_full")
      .as[(Double, Long, Option[Long], Long, Double, Double, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val deg = rows(0.1)
    assert(deg._2 === 5L && deg._3.isEmpty, s"expected NULL qhat, got $deg")
    assert(deg._5 === 1.0 && deg._6 === 2.0)
    assert(deg._7 === 0L && deg._8 === deg._4)
    val fin = rows(0.2)
    assert(fin._3.nonEmpty, "alpha=0.2 must keep a finite qhat at n_cal=5")
  }

  test("real-corpus coverage sits in the finite-sample band of 1-alpha") {
    val pred = Models.qualityPredictions(spark, sf)
    val rows = QualityModel.conformal(pred)
      .select("alpha", "n_test", "coverage", "avg_set_size")
      .as[(Double, Long, Double, Double)].collect()
    assert(rows.length === QualityModel.ConformalAlphas.length)
    rows.foreach { case (alpha, nTest, cov, sz) =>
      val slack = 4.0 * math.sqrt(alpha * (1 - alpha) / nTest)
      assert(cov >= 1 - alpha - slack,
        s"alpha=$alpha coverage $cov below band (n_test=$nTest)")
      assert(sz >= 0.0 && sz <= 2.0)
    }
  }
}
