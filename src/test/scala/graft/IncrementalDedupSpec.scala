package graft

import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** incrementalMinhashPairs(existing, new) must equal the full
  * recompute over the signature union restricted to pairs touching a
  * new doc — including the bucket-cap decision, which depends on TOTAL
  * bucket occupancy (the subtle part: dropping old members of a
  * touched bucket would change the cap and admit pairs the full run
  * rejects).
  */
class IncrementalDedupSpec extends SparkSpec {

  test("incremental pairs == full recompute filtered to new-doc pairs") {
    val docs = Tables.documents(spark, sf)
    val isNew = col("doc_id") % 3 === 0 // a third of the corpus as the batch
    val allSigs = Dedup.minhashSignatures(Dedup.docShingles(docs))
    val existing = allSigs.filter(!isNew)
    val newSigs = Dedup.minhashSignatures(
      Dedup.docShingles(docs.filter(isNew)))

    val incremental = Dedup.incrementalMinhashPairs(existing, newSigs)
    val full = Dedup.minhashPairs(allSigs)
      .filter(col("doc_a") % 3 === 0 || col("doc_b") % 3 === 0)

    assert(incremental.exceptAll(full).count() === 0)
    assert(full.exceptAll(incremental).count() === 0)
    // the demo batch split must actually produce pairs on this data
    assert(incremental.count() > 0)
  }

  test("an empty ingest batch produces no pairs and touches no buckets") {
    val docs = Tables.documents(spark, sf)
    val allSigs = Dedup.minhashSignatures(Dedup.docShingles(docs))
    val empty = allSigs.filter(lit(false))
    assert(Dedup.incrementalMinhashPairs(allSigs, empty).count() === 0)
  }

  test("streaming foreachBatch maintenance equals the batch incremental run") {
    val docs = Tables.documents(spark, sf)
    // the registered demo split: % 5 == 0 arrives, the rest stand
    val existingBands = Dedup.bandTable(
      Dedup.minhashSignatures(Dedup.docShingles(docs))
        .filter(col("doc_id") % 5 =!= 0))
    val batchTwin = Dedup.incrementalMinhashPairsFromBands(existingBands,
      Dedup.minhashSignatures(Dedup.docShingles(docs.filter(col("doc_id") % 5 === 0))))
    val streamed = graft.streaming.Streams
      .incrementalDedupStreamOnce(spark, sf, existingBands)
    assert(streamed.exceptAll(batchTwin).count() === 0)
    assert(batchTwin.exceptAll(streamed).count() === 0)
    // idempotence: a same-session re-run replays no batch, sink unchanged
    val again = graft.streaming.Streams
      .incrementalDedupStreamOnce(spark, sf, existingBands)
    assert(again.count() === streamed.count())
  }
}
