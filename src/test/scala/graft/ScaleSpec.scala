package graft

import org.apache.spark.sql.functions._

/** Properties of the scale probe's replica generators ([[Scale]]):
  * the probe's conclusions are only as good as its synthetic corpus,
  * so the corpus-shape claims (disjoint ids, preserved per-doc word
  * statistics, preserved WITHIN-replica dup structure, divergent
  * ACROSS-replica shingles) are pinned here. */
class ScaleSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50).cache()

  test("scaleDocuments: rows scale by factor, ids disjoint, word multiset and lang preserved") {
    val scaled = Scale.scaleDocuments(docs, 3).cache()
    val n = docs.count()
    assert(scaled.count() === 3 * n)
    assert(scaled.select("doc_id").distinct().count() === 3 * n)
    // replica r carries base stats: same multiset of words per doc
    val base = docs.select(col("doc_id"), array_sort(split(col("text"), " ")).as("w0"),
      col("lang").as("lang0"))
    val rep = scaled.filter(col("doc_id") >= Scale.DocStride * 2)
      .select((col("doc_id") - Scale.DocStride * 2).as("doc_id"),
        array_sort(split(col("text"), " ")).as("w1"), col("lang").as("lang1"))
    assert(base.join(rep, Seq("doc_id"))
      .filter(col("w0") =!= col("w1") || col("lang0") =!= col("lang1"))
      .count() === 0)
    scaled.unpersist()
  }

  test("scaleDocuments: within-replica near-dups survive, cross-replica shingles diverge") {
    // two docs differing in ONE word: near-dups before and (claim)
    // after the seeded word-sort, because the sort key ignores the doc
    val words = (1 to 40).map(i => s"w$i")
    val a = words.mkString(" ")
    val b = (words.dropRight(1) :+ "zz").mkString(" ")
    val pair = Seq((0L, a, "en", "s", a.length.toLong),
      (1L, b, "en", "s", b.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val scaled = Scale.scaleDocuments(pair, 2)
    def trigrams(t: org.apache.spark.sql.Column) = {
      val w = split(t, " ")
      transform(sequence(lit(0), size(w) - 3), i =>
        concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3)))
    }
    val g = scaled.select(col("doc_id"), explode(array_distinct(trigrams(col("text")))).as("s"))
    def overlap(idA: Long, idB: Long): Long =
      g.filter(col("doc_id") === idA).select("s")
        .intersect(g.filter(col("doc_id") === idB).select("s")).count()
    val withinBase = overlap(0L, 1L)
    val withinRep = overlap(Scale.DocStride, Scale.DocStride + 1L)
    val across = overlap(0L, Scale.DocStride)
    // a one-word edit leaves most trigrams shared within each replica
    assert(withinBase > 25, s"base pair overlap $withinBase")
    assert(withinRep > 25, s"replica pair overlap $withinRep")
    // the SAME doc across replicas shares almost nothing (word order shuffled)
    assert(across < withinRep / 4, s"cross-replica overlap $across vs $withinRep")
  }

  test("scaleEmbeddings: deterministic, disjoint ids, dim preserved, no cross-replica dups") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet").limit(30).cache()
    val s1 = Scale.scaleEmbeddings(embs, 2, 64)
    val s2 = Scale.scaleEmbeddings(embs, 2, 64)
    assert(s1.exceptAll(s2).count() === 0)
    assert(s1.count() === 2 * embs.count())
    assert(s1.filter(size(col("embedding")) =!= 64).count() === 0)
    // replica vectors are not copies of base vectors
    val basev = embs.select(col("embedding").as("e"))
    val repv = s1.filter(col("vec_id") >= Scale.VecStride).select(col("embedding").as("e"))
    assert(repv.intersect(basev).count() === 0)
    embs.unpersist()
  }

  test("scaleEvents and scaleEdges: disjoint strides, structure copied") {
    val ev = Seq((1L, 10L, "click", 1.0), (2L, 11L, "purchase", 2.0))
      .toDF("event_id", "user_id", "event_type", "value")
    val se = Scale.scaleEvents(ev, 2)
    assert(se.count() === 4)
    assert(se.select("user_id").distinct().count() === 4)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val sed = Scale.scaleEdges(edges, 3)
    assert(sed.count() === 6)
    // replicas are disjoint components: no edge crosses a stride boundary
    assert(sed.filter(
      expr(s"src div ${Scale.NodeStride}") =!= expr(s"dst div ${Scale.NodeStride}"))
      .count() === 0)
  }
}
