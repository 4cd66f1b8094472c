package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.Selection

/** Selection.qualityPareto: skyline semantics on a hand-built
  * dominance fixture (ties on both dims survive together, equal-margin
  * longer docs fall) and mutual non-domination on the real corpus. */
class ParetoSpec extends SparkSpec {
  import spark.implicits._

  // texts with exactly k whitespace tokens; margins injected directly
  private def fixture: (DataFrame, DataFrame) = {
    val docs = Seq(
      1L -> "a",
      2L -> "a b",
      3L -> "a b c",          // doc 3: 3 tokens (distinct length bucket)
      5L -> "a b c d",
      6L -> "w x y z",
      7L -> "p q r s").toDF("doc_id", "text")
    val preds = Seq(
      (1L, 5L), (2L, 7L), (3L, 7L),
      (5L, 9L), (6L, 9L), (7L, 8L)).toDF("doc_id", "margin")
    (docs, preds)
  }

  test("skyline keeps undominated docs, drops equal-margin longer ones, keeps both of a tie") {
    val (docs, preds) = fixture
    val got = Selection.qualityPareto(docs, preds)
      .select("doc_id").as[Long].collect().toSet
    // doc 3 (3 tokens, margin 7) is dominated by doc 2 (2 tokens,
    // margin 7 — strict on length); doc 7 by docs 5/6 (equal length,
    // higher margin); the (4-token, margin-9) TIE keeps both 5 and 6
    assert(got === Set(1L, 2L, 5L, 6L))
  }

  test("no output row dominates another, and the sweep is deterministic") {
    val docs = Tables.documents(spark, sf)
    val preds = Models.qualityPredictions(spark, sf)
    val out = Selection.qualityPareto(docs, preds).cache()
    val a = out.select(col("doc_id").as("a_id"), col("n_tokens").as("a_t"),
      col("margin").as("a_m"))
    val b = out.select(col("doc_id").as("b_id"), col("n_tokens").as("b_t"),
      col("margin").as("b_m"))
    val dominating = a.crossJoin(b)
      .filter(col("a_id") =!= col("b_id") &&
        col("a_t") <= col("b_t") && col("a_m") >= col("b_m") &&
        (col("a_t") < col("b_t") || col("a_m") > col("b_m")))
    assert(dominating.count() === 0)
    val again = Selection.qualityPareto(docs, preds)
    assert(out.exceptAll(again).count() === 0 &&
      again.exceptAll(out).count() === 0)
    out.unpersist()
  }
}
