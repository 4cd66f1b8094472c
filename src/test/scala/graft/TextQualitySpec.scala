package graft

import org.apache.spark.sql.functions._
import graft.llm.{Relevance, TextStats}

/** Round-6 text-quality signals: bigram-LM surprisal and top-K-vocab
  * OOV coverage. */
class TextQualitySpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("n_chars", length(col("text")))

  test("bigram surprisal: predictable word order scores below noisy order") {
    // corpus-wide counts: "a b"×4, "b a"×3, "a c"×1; ctx a=5, b=3.
    // doc 1 repeats the high-probability transitions; doc 2 takes the
    // rare "a c" branch once → strictly higher average NLL.
    val out = Relevance.bigramSurprisal(docs(
        1L -> "a b a b a b",
        2L -> "a b a c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 === 5L) // 6 tokens → 5 bigrams
    assert(out(2L)._1 === 3L)
    assert(out(2L)._2 > 0.0)
    assert(out(1L)._2 < out(2L)._2)
    // exact MLE check: doc1 avg = (3·ln(5/4) + 2·ln(3/3)) / 5
    assert(math.abs(out(1L)._2 - 3.0 * math.log(1.25) / 5.0) < 1e-8)
  }

  test("bigram surprisal: single-corpus MLE — uniform context halves to ln 2") {
    // one doc, context "x" continues to "y" and "z" once each:
    // p = 1/2 for both bigrams, p("y z"-style mid bigrams) ... keep it
    // minimal: "x y x z" → bigrams (x y), (y x), (x z); ctx x=2, y=1.
    // nll(x y) = ln 2, nll(y x) = 0, nll(x z) = ln 2 → avg = 2ln2/3.
    val Seq(r) = Relevance.bigramSurprisal(docs(1L -> "x y x z")).collect().toSeq
    assert(r.getLong(1) === 3L)
    assert(math.abs(r.getDouble(2) - 2.0 * math.log(2.0) / 3.0) < 1e-8)
  }

  test("bigram surprisal: docs under 2 tokens drop out") {
    val out = Relevance.bigramSurprisal(docs(1L -> "solo", 2L -> "a b"))
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(2L))
  }

  test("vocab coverage: terms beyond the top-K cut count as OOV") {
    // 258 distinct terms: t000..t255 appear twice (in-vocab under
    // K=256 with the count-desc/term-asc order), rare1/rare2 once.
    val frequent = (0 until 256).map(i => f"t$i%03d")
    val text1 = (frequent ++ Seq("rare1")).mkString(" ")
    val text2 = (frequent ++ Seq("rare2")).mkString(" ")
    val out = TextStats.vocabCoverage(docs(1L -> text1, 2L -> text2))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) === ((257L, 1L, 1.0 / 257.0)))
    assert(out(2L) === ((257L, 1L, 1.0 / 257.0)))
  }

  test("vocab coverage: fully in-vocab corpus has zero OOV everywhere") {
    val out = TextStats.vocabCoverage(docs(1L -> "a b c a", 2L -> "b c"))
    assert(out.agg(sum("n_oov")).as[Long].head() === 0L)
  }
}
