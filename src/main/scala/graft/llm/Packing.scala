package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step between a curated corpus and a
  * pretraining batch: documents are concatenated (in a deterministic
  * order) and cut into fixed token-budget training sequences, so short
  * documents share a context window instead of wasting padding.
  *
  * This is the linear concatenate-and-chunk form: within a pack group,
  * documents are laid out in doc_id order; a document's sequence is
  * the one its STARTING offset falls in (`floor(prefix_sum / budget)`,
  * prefix = running total excluding the document itself). One keyed
  * window cumsum — no driver-side loop, no RNG.
  *
  * Scale shape: the cumsum is per (source, pack bucket) where the
  * bucket is the salted md5-60 device ([[Splits.saltedBucket]]), so
  * group size — the per-partition sort budget — is corpus size /
  * (sources × [[PackBuckets]]); raise the bucket count with the
  * corpus. Token counts come from `n_chars` (the ceil(chars/4)
  * estimator of [[TextStats]]), so the scan never reads `text`.
  */
object Packing {

  val PackBudget = 4096L
  val PackBuckets = 8L
  val PackSalt = "pack|"

  def packSequences(documents: DataFrame,
                    budget: Long = PackBudget): DataFrame = {
    val nTokens: Column = TextStats.nTokensEst(col("n_chars"))
    val bucket = Splits.saltedBucket(PackSalt, col("doc_id"), PackBuckets)
    val w = Window.partitionBy(col("source"), col("bucket"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .select(col("source"), col("doc_id"), bucket.as("bucket"),
        nTokens.as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .select(
        col("source"), col("bucket"), col("doc_id"), col("n_tokens"),
        // the document STARTS at cum - n_tokens; `div` is LONG integer
        // division (DuckDB mirrors with //), no double round-trip
        expr(s"(cum_tokens - n_tokens) div ${budget}L").as("seq_index"),
        pmod(col("cum_tokens") - col("n_tokens"), lit(budget))
          .as("offset_in_seq"))
  }

  val BatchSize = 16L
  val LenSalt = "lenb|"
  val LenSubBuckets = 4L

  /** Power-of-two length-bucket boundary (estimated tokens) — the
    * fixed ladder a padded-batch loader buckets by. */
  private def lenBucket(n: Column): Column =
    when(n <= 64, 64L).when(n <= 128, 128L).when(n <= 256, 256L)
      .when(n <= 512, 512L).when(n <= 1024, 1024L).otherwise(4096L)

  /** LENGTH-BUCKETED BATCH construction — the padded-batch alternative
    * to [[packSequences]] (SFT/eval loaders pad to the batch max
    * instead of concatenating): documents are bucketed by a fixed
    * power-of-two token-length ladder, ordered longest-first within
    * (bucket, salted sub-bucket), and cut into consecutive batches of
    * [[BatchSize]]; each batch row reports its padding efficiency
    * (Σtokens / (n·max) — 1.0 means zero waste). Longest-first keeps
    * near-equal lengths adjacent, which is what makes the padding
    * efficient; the salted sub-bucket bounds the window sort group
    * exactly like [[PackBuckets]] does for packing — scale shape:
    * corpus / (ladder × [[LenSubBuckets]]) per sort group, one
    * aggregation on top. Token counts come from `n_chars`; the scan
    * never reads `text`. */
  def lengthBucketedBatches(documents: DataFrame,
                            batchSize: Long = BatchSize): DataFrame = {
    val base = documents.select(col("doc_id"),
        TextStats.nTokensEst(col("n_chars")).as("n_tokens"),
        Splits.saltedBucket(LenSalt, col("doc_id"), LenSubBuckets).as("sub"))
      .withColumn("len_bucket", lenBucket(col("n_tokens")))
    val w = Window.partitionBy(col("len_bucket"), col("sub"))
      .orderBy(col("n_tokens").desc, col("doc_id"))
    base.withColumn("rn", row_number().over(w))
      .withColumn("batch_idx", expr(s"(rn - 1) div ${batchSize}L"))
      .groupBy("len_bucket", "sub", "batch_idx")
      .agg(count(lit(1)).as("n_docs"),
        max("n_tokens").as("max_tokens"),
        sum("n_tokens").as("sum_tokens"))
      .select(col("len_bucket"), col("sub"), col("batch_idx"),
        col("n_docs"), col("max_tokens"), col("sum_tokens"),
        (col("sum_tokens").cast("double") /
          (col("n_docs") * col("max_tokens")).cast("double"))
          .as("pad_efficiency"))
  }

  val ShardSalt = "shard|"
  val NShards = 16L

  /** Deterministic shard assignment of packed sequences — the step
    * that turns a packed corpus into the fixed set of training-shard
    * files a data loader streams (webdataset-style). A sequence's
    * shard is the salted md5-60 of its (source, bucket, seq_index)
    * key mod [[NShards]]: reproducible, growth-stable, and uniform —
    * shards stay balanced no matter how skewed sources are. Returns
    * per-shard stats (the manifest a loader checks before an epoch):
    * sequence/document/token counts. Scale: one hash projection plus
    * one [[NShards]]-group aggregation. */
  def shardStats(packed: DataFrame, nShards: Long = NShards): DataFrame = {
    val seqKey = concat(col("source"), lit("|"),
      col("bucket").cast("string"), lit("|"), col("seq_index").cast("string"))
    packed
      .withColumn("shard", Splits.saltedBucket(ShardSalt, seqKey, nShards))
      .groupBy(col("shard"))
      .agg(
        countDistinct(col("source"), col("bucket"), col("seq_index")).as("n_seqs"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))
  }
}
