package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.Unigram

/** llm.Unigram: the Viterbi fold minimizes quantized-nanonat cost
  * with the (cost, seg) struct tiebreak, training preserves
  * single-character coverage through the prune, and every emitted
  * segmentation reconstructs its word exactly. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: Seq[String]): DataFrame =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("viterbi picks the min-cost path; exact ties break on seg asc") {
    val words = Seq(("abab", 10L), ("ab", 5L)).toDF("word", "freq")
    // hand-built model: 'ab' is cheap, 'ba' punitive, chars mid
    val model = Seq(("a", 50L), ("b", 50L), ("ab", 400L), ("ba", 0L),
      ("abab", 0L)).toDF("piece", "cnt")
    val seg = Unigram.viterbi(words, Unigram.costs(model))
      .select("word", "pieces").as[(String, String)].collect().toMap
    assert(seg("abab") === "ab ab") // 2·cost(ab) < anything char-mixed
    assert(seg("ab") === "ab")
    // exact tie: equal counts make cost(a)+cost(b) vs cost(ab) differ,
    // but equal-cost candidates must break on the BUILT STRING asc —
    // a model where both paths cost the same:
    val tie = Seq(("a", 10L), ("b", 10L), ("c", 10L)).toDF("piece", "cnt")
    val segTie = Unigram.viterbi(Seq(("ab", 1L)).toDF("word", "freq"),
        Unigram.costs(tie))
      .select("pieces").as[String].head()
    assert(segTie === "a b") // only chars in vocab — forced, and stable
  }

  test("training keeps every word segmentable and reconstructable") {
    val corpus = docs(Seq(
      "stream stream stream batch batch join join join join",
      "stream join filter filter window window window",
      "aggregate aggregate shuffle shuffle shuffle broadcast"))
    val (vocab, seg) = Unigram.train(corpus)
    val v = vocab.select("piece").as[String].collect().toSet
    // single-char coverage survives the prune
    val chars = corpus.select(explode(split(col("text"), "\\s+")).as("w"))
      .select(explode(split(col("w"), "")).as("ch"))
      .filter(col("ch") =!= "").distinct().as[String].collect().toSet
    assert(chars.subsetOf(v), s"missing chars: ${chars -- v}")
    // every distinct word appears, and pieces concat back to the word
    val rows = seg.select("word", "pieces").as[(String, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w, p) =>
      assert(p.replace(" ", "") === w, s"$w segmented as '$p'")
      p.split(" ").foreach(piece =>
        assert(v.contains(piece), s"piece '$piece' not in pruned vocab"))
    }
    // vocab ids are dense from 1 in (count desc, piece asc) order
    val ids = vocab.orderBy("piece_id")
      .select("piece_id", "n_occurrences").as[(Long, Long)].collect()
    assert(ids.map(_._1).toSeq === (1L to ids.length).toSeq)
    assert(ids.map(_._2).toSeq === ids.map(_._2).sortBy(-_).toSeq)
  }

  test("fertility compare prices both tokenizers over the same corpus") {
    val corpus = docs(Seq("stream stream batch", "stream batch batch"))
    val (_, uniSeg) = Unigram.train(corpus)
    val (_, bpeSeg) = graft.llm.Bpe.train(corpus)
    val byTok = Unigram.fertilityCompare(bpeSeg, uniSeg)
      .select("tokenizer", "total_words", "total_pieces", "fertility")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // same word universe on both sides (the comparison's precondition)
    assert(byTok("bpe")._1 === byTok("unigram")._1)
    assert(byTok("unigram")._3 >= 1.0)
    assert(byTok("unigram")._3 ===
      byTok("unigram")._2.toDouble / byTok("unigram")._1.toDouble)
  }
}
