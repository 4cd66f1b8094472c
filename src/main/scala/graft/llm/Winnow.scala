package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken 2003
  * — the MOSS algorithm): from every window of [[Window]] consecutive
  * k-gram hashes, keep the minimum (ties to the smallest position),
  * then deduplicate the selected positions. The guarantee that makes
  * it THE partial-overlap detector (vs [[TextStats]]' whole-document
  * rolling fingerprint, which only catches identical docs): any
  * shared run of at least Window+K−1 tokens between two documents
  * yields at least one IDENTICAL selected fingerprint in both, while
  * only ~2/(Window+1) of positions are kept — guaranteed detection at
  * a fixed sampling rate.
  *
  * Determinism: k-gram hashes are md5-prefix60 integers; the
  * per-window winner is min(hash) then min(position) — a total order,
  * no tie left to partition luck. Shared-doc candidates inherit the
  * [[Dedup.MinhashBucketCap]] bucket-cap discipline: nothing is
  * all-pairs.
  *
  * Scale: the window explosion is a fixed ×[[Window]] row blow-up of
  * the k-gram stream (linear), aggregated per (doc, window) with
  * map-side combine below a doc-keyed repartition — embarrassingly
  * parallel per document; the pair stage is a fingerprint-keyed
  * bucket join, capped per bucket like every other dedup family. */
object Winnow {

  /** K-grams are the shared word 3-shingles ([[Dedup.shingles]]). */
  val K = 3
  /** Winnowing window: guarantee threshold t = Window + K − 1 = 7
    * shared tokens; expected density 2/(Window+1) ≈ 0.4. */
  val Window = 4
  /** Two docs become a candidate pair at this many shared selected
    * fingerprints. */
  val MinShared = 2L
  /** Per-fingerprint bucket cap (the MinhashBucketCap convention). */
  val BucketCap = 64L

  /** (doc_id, pos, fp): the selected fingerprints of every document —
    * pos is the 0-based k-gram position, fp the 60-bit k-gram hash.
    * Documents with fewer than [[Window]] k-grams winnow their single
    * truncated window (the whole-doc min), matching the paper's
    * boundary convention. */
  def fingerprints(documents: DataFrame): DataFrame = {
    val kg = documents
      .select(col("doc_id"), Dedup.words(col("text")).as("w"))
      .repartition(col("doc_id"))
      .select(col("doc_id"), posexplode(Dedup.shingles(col("w"))).as(Seq("pos", "sh")))
      .select(col("doc_id"), col("pos"), Dedup.hex60(col("sh")).as("h"))
    val n = kg.groupBy("doc_id").agg(max(col("pos")).as("max_pos"))
    // each position joins every window [s, s+Window-1] that covers it;
    // valid starts are 0..max(n-Window, 0)
    val wrows = kg.join(n, Seq("doc_id"))
      .select(col("doc_id"), col("pos"), col("h"),
        explode(sequence(
          greatest(col("pos") - (Window - 1), lit(0)),
          least(col("pos"), greatest(col("max_pos") - (Window - 1), lit(0)))))
          .as("s"))
    val wmin = wrows.groupBy("doc_id", "s").agg(min(col("h")).as("m"))
      .withColumnRenamed("doc_id", "m_doc_id").withColumnRenamed("s", "m_s")
    wrows.join(wmin,
        col("doc_id") === col("m_doc_id") && col("s") === col("m_s") &&
          col("h") === col("m"))
      .groupBy(col("doc_id"), col("s"))
      .agg(min(col("pos")).as("pos"), min(col("m")).as("fp"))
      .select(col("doc_id"), col("pos"), col("fp")).distinct()
  }

  /** Candidate partial-overlap pairs: documents sharing at least
    * [[MinShared]] selected fingerprints, found through a
    * fingerprint-keyed bucket join with the [[BucketCap]] guard. */
  def sharedDocs(fps: DataFrame): DataFrame = {
    val byFp = fps.select(col("doc_id"), col("fp")).distinct()
    val ok = byFp.groupBy("fp").agg(count(lit(1)).as("n"))
      .filter(col("n") <= BucketCap).select("fp")
    val capped = byFp.join(ok, Seq("fp"), "left_semi")
    val a = capped.as("a"); val b = capped.as("b")
    a.join(b, col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_fps"))
      .filter(col("n_shared_fps") >= MinShared)
  }
}
