package graft

import org.apache.spark.sql.functions._
import graft.llm.{HashEmbed, QualityModel}

/** The perceptron quality model's training dynamics, pinned
  * independently of the DuckDB oracle (which replays the same
  * arithmetic): round-1 weights have a CLOSED FORM from zero
  * initialization, and predictions must be the margin threshold. */
class QualityModelSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val stats = Models.textStats(spark, sf)

  test("trajectory shape and closed-form round 1: w1 = sum of positive docs' features") {
    val w = QualityModel.trainedWeights(spark, docs, stats).cache()
    assert(w.count() === QualityModel.Rounds.toLong * (HashEmbed.Dim + 1))
    // w0 = 0 ⇒ all margins 0 ⇒ predictions 0 ⇒ err = y ⇒
    // w1[dim] = Σ over y=1 docs of x[dim]
    val pos = QualityModel.labels(stats).filter(col("y") === 1)
    val expected = QualityModel.features(docs)
      .join(pos, Seq("doc_id"))
      .groupBy(col("bucket").as("dim")).agg(sum(col("v")).as("expected_w"))
    val got = w.filter(col("round") === 1)
    val joined = got.join(expected, Seq("dim"), "left")
      .select(col("dim"), col("weight"),
        coalesce(col("expected_w"), lit(0L)).as("expected_w"))
    assert(joined.filter(col("weight") =!= col("expected_w")).count() === 0)
    w.unpersist()
  }

  test("predictions are the exact margin threshold and cover every doc") {
    val w = QualityModel.trainedWeights(spark, docs, stats)
    val p = QualityModel.predictions(docs, stats, w).cache()
    assert(p.count() === docs.count())
    assert(p.filter(
      (col("margin") > 0 && col("predicted") =!= 1) ||
        (col("margin") <= 0 && col("predicted") =!= 0)).count() === 0)
    assert(p.filter(!col("label").isin(0, 1)).count() === 0)
    // deterministic end to end (fixed-point training has no float path)
    val again = QualityModel.predictions(docs, stats,
      QualityModel.trainedWeights(spark, docs, stats))
    assert(p.exceptAll(again).count() === 0 && again.exceptAll(p).count() === 0)
    p.unpersist()
  }

  test("evaluation: hand-computed confusion + tie-averaged AUC on a fixture") {
    import spark.implicits._
    // margins sorted: -1(neg, rank 1), 2&2 (one pos one neg, avg rank
    // 2.5), 3(pos, rank 4) → pos rank sum 6.5, AUC = (6.5-3)/(2·2)
    val pred = Seq(
      (1L, 1, 3L, 1), (2L, 0, 2L, 1), (3L, 1, 2L, 1), (4L, 0, -1L, 0))
      .toDF("doc_id", "label", "margin", "predicted")
    val r = QualityModel.evaluation(pred).collect().head
    assert(r.getAs[Long]("n_docs") === 4L)
    assert(r.getAs[Long]("tp") === 2L && r.getAs[Long]("fp") === 1L &&
      r.getAs[Long]("fn") === 0L && r.getAs[Long]("tn") === 1L)
    assert(r.getAs[Double]("accuracy") === 0.75)
    assert(r.getAs[Double]("precision") === 2.0 / 3.0)
    assert(r.getAs[Double]("recall") === 1.0)
    assert(r.getAs[Double]("f1") === 0.8)
    assert(r.getAs[Double]("auc") === 0.875)
  }

  test("calibration: hand-computed decile reliability on a fixture") {
    import spark.implicits._
    // 20 docs, margin = 21 - doc_id (so doc 1 ranks first); label = 1
    // for the top 6 margins and doc 15 (a miscalibrated straggler)
    val pred = (1L to 20L).map { i =>
      (i, if (i <= 6 || i == 15) 1 else 0, 21L - i, if (21L - i > 0) 1 else 0)
    }.toDF("doc_id", "label", "margin", "predicted")
    val got = QualityModel.calibration(pred).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got.keySet == (1 to 10).toSet) // 10 buckets of 2
    assert(got(1) == ((2L, 2L, 1.0, 19.5)))   // docs 1,2: margins 20,19
    assert(got(3) == ((2L, 2L, 1.0, 15.5)))   // docs 5,6 — both positive
    assert(got(8) == ((2L, 1L, 0.5, 5.5)))    // docs 15,16 — the straggler
    assert(got(10) == ((2L, 0L, 0.0, 1.5)))   // docs 19,20
    assert(got.values.map(_._1).sum == 20L)
  }

  test("evaluation on the trained corpus model: one coherent row") {
    val p = QualityModel.predictions(docs, stats,
      QualityModel.trainedWeights(spark, docs, stats))
    val rows = QualityModel.evaluation(p).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("n_docs") === docs.count())
    assert(r.getAs[Long]("tp") + r.getAs[Long]("fp") +
      r.getAs[Long]("fn") + r.getAs[Long]("tn") === r.getAs[Long]("n_docs"))
    assert(r.getAs[Long]("n_pos") > 0 && r.getAs[Long]("n_neg") > 0)
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    // a trained model must beat coin-flip ranking on its own corpus
    assert(auc > 0.5)
  }

  test("training moves weights after round 1 on this corpus") {
    val w = QualityModel.trainedWeights(spark, docs, stats)
    // a fixed point after one round would mean the zero-init model
    // already classifies the corpus perfectly — not true here, so
    // later rounds must differ from round 1 somewhere
    val r1 = w.filter(col("round") === 1).select(col("dim"), col("weight").as("w1"))
    val rN = w.filter(col("round") === QualityModel.Rounds)
      .select(col("dim"), col("weight").as("wN"))
    assert(r1.join(rN, Seq("dim")).filter(col("w1") =!= col("wN")).count() > 0)
  }
}
