package graft

import org.apache.spark.sql.functions._
import graft.llm.Winnow

/** The winnowing guarantee (Schleimer et al. 2003): any shared token
  * run of length ≥ Window + K − 1 yields at least one identical
  * selected fingerprint in both documents, while selection keeps only
  * a ~2/(Window+1) fraction of positions. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")
      .withColumn("source", lit("srcT")).withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))

  test("guarantee: a long shared run produces shared fingerprints in both docs") {
    // docs 1 and 2 share 12 consecutive tokens = 10 shared k-grams =
    // two DISJOINT full windows of 4, each guaranteeing one shared
    // selected fingerprint (distinct tokens -> distinct hashes), so
    // the MinShared=2 pair threshold is met BY CONSTRUCTION, not luck
    val shared = "p q r s t u v w x y z zz"
    val docs = mkDocs(
      1L -> s"a1 b1 c1 d1 $shared e1 f1 g1",
      2L -> s"a2 b2 $shared c2 d2 e2 f2 g2 h2",
      3L -> "k l m n o only here once nothing in common")
    val pairs = Winnow.sharedDocs(Winnow.fingerprints(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("density: selection keeps roughly 2/(Window+1) of positions, never everything") {
    val docs = Tables.documents(spark, sf).limit(100)
    val nKgrams = docs
      .select(size(graft.llm.Dedup.shingles(graft.llm.Dedup.words(col("text")))).as("n"))
      .agg(sum(when(col("n") > 0, col("n")).otherwise(lit(0)))).collect()(0).getLong(0)
    val nFps = Winnow.fingerprints(docs).count()
    val density = nFps.toDouble / nKgrams
    // theoretical expectation 2/(W+1) = 0.4; allow slack for hash
    // collisions within windows and boundary windows
    assert(density > 0.2 && density < 0.65, s"density $density out of range")
  }

  test("batchNovelty: unseen shingles count as novel, standing overlap doesn't") {
    // standing docs (id % 5 != 0) own "a b c d" shingles; new doc 10
    // repeats them (novelty 0), new doc 15 is half-new
    val docs = mkDocs(
      1L -> "a b c d",            // standing: shingles {a b c, b c d}
      10L -> "a b c d",           // new: both shingles seen -> novelty 0
      15L -> "a b c x",           // new: {a b c} seen, {b c x} novel
      20L -> "q r s t")           // new: all novel
    val got = graft.llm.Dedup.batchNovelty(graft.llm.Dedup.docShingles(docs))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet === Set(10L, 15L, 20L))
    assert(got(10L) === ((2L, 0L, 0.0)))
    assert(got(15L) === ((2L, 1L, 0.5)))
    assert(got(20L) === ((2L, 2L, 1.0)))
  }

  test("tiny docs winnow their single truncated window") {
    // 3 words -> exactly one k-gram -> one fingerprint at pos 0
    val docs = mkDocs(9L -> "just three words")
    val fps = Winnow.fingerprints(docs).collect()
    assert(fps.length === 1 && fps(0).getInt(1) === 0)
    // fewer than K words -> no k-grams -> absent
    assert(Winnow.fingerprints(mkDocs(8L -> "two words")).count() === 0L)
  }
}
