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
