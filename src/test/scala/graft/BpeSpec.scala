package graft

import org.apache.spark.sql.functions._
import graft.llm.Bpe

/** Distributed BPE training ([[llm.Bpe]]): hand-traced merge dynamics,
  * greedy non-overlap application, sentinel exhaustion, and the
  * round-trip invariant on the real corpus. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))

  test("first merge is the most frequent pair (HuggingFace example)") {
    // hug×10 pug×5 pun×12 bun×4 hugs×5 → pair (u,g) = 10+5+5 = 20 wins
    val corpus = docs(
      (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(12)("pun") ++
        Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")).mkString(" "))
    val merges = Bpe.train(corpus)._1.orderBy("merge_rank").collect()
    assert((merges(0).getString(1), merges(0).getString(2), merges(0).getLong(4))
      === (("u", "g", 20L)))
  }

  test("greedy non-overlapping merge + exhaustion under the sentinel") {
    // "aaaa": iter1 pair (a,a)×3 → "aa aa"; iter2 (aa,aa)×1 → "aaaa";
    // iters 3+ have no pairs → sentinel wins, no merge row emitted.
    val (merges, seg) = Bpe.train(docs("aaaa"))
    val m = merges.orderBy("merge_rank").collect()
    assert(m.length === 2)
    assert((m(0).getString(1), m(0).getString(2), m(0).getLong(4)) === (("a", "a", 3L)))
    assert((m(1).getString(1), m(1).getString(2), m(1).getLong(4)) === (("aa", "aa", 1L)))
    val s = seg.collect().map(r => r.getString(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(s("aaaa") === ((1L, "aaaa")))
  }

  test("merged symbols participate in later rounds (multi-round dynamics)") {
    // "abab abab abc": iter1 (a,b)×5 → ab; iter2 (ab,ab)×2 → abab;
    // remaining "abc" path merges (ab,c) later.
    val (merges, seg) = Bpe.train(docs("abab abab abc abab"))
    val m = merges.orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(m(0) === (("a", "b")))
    assert(m(1) === (("ab", "ab")))
    val pieces = seg.filter(col("word") === "abab").select("pieces").as[String].head()
    assert(pieces === "abab")
  }

  test("segmentation pieces rebuild the word exactly (real corpus)") {
    val seg = Models.bpeSegmentation(spark, sf)
    assert(seg.filter(regexp_replace(col("pieces"), " ", "") =!= col("word"))
      .count() === 0L)
    // freq mass is preserved: Σ freq = corpus token count
    val total = seg.agg(sum("freq")).as[Long].head()
    val toks = Bpe.wordFreqs(Tables.documents(spark, sf)).agg(sum("freq")).as[Long].head()
    assert(total === toks)
  }
}
