package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.llm.Dedup.hex60

/** RENDEZVOUS (highest-random-weight) HASHING (Thaler & Ravishankar
  * 1996) — the shard router consistent hashing grew up into: every
  * (key, shard) pair gets a deterministic weight, the key lives on its
  * argmax shard, and removing a shard moves EXACTLY the keys that
  * lived there (everyone else's argmax is untouched) — no ring, no
  * virtual nodes, no rebalancing beyond the lost shard's own keys.
  * shard_stability gates that minimal-motion guarantee as data, not
  * doctrine: assignments under N and N−1 shards are computed side by
  * side and the moved set is required to equal the removed shard's
  * population.
  *
  * Weights reuse the shared 60-bit md5 primitive
  * ([[graft.llm.Dedup.hex60]] — already bit-mirrored in the DuckDB
  * oracle), so routing is reproducible across engines, sessions, and
  * languages. The fan-out is a map-side explode (K rows per key, no
  * shuffle); the argmax is a keyed window (partitioned by key, never
  * global). At 100 TB routing 10¹⁰ keys over K shards is one pass —
  * the per-key work is K hashes and a K-row top-1. */
object Sharding {

  val NumShards = 16

  /** (doc_id, shard): each key's argmax-weight shard among
    * 0..nShards−1. Ties (2⁻⁶⁰-improbable) break toward the lower
    * shard id — a total order, same on both engines. */
  def hrwAssignments(keys: DataFrame, nShards: Int): DataFrame = {
    val fanned = keys
      .select(col("doc_id"),
        explode(array((0 until nShards).map(lit): _*)).as("shard"))
      .withColumn("h",
        hex60(concat(col("doc_id").cast("string"), lit(":"),
          col("shard").cast("string"))))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("h").desc, col("shard").asc)
    fanned
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("shard"))
  }

  /** Per-shard load report under [[NumShards]]: exact counts, share,
    * and the skew ratio n·K/total (1.0 = perfectly balanced). */
  def shardRouting(documents: DataFrame): DataFrame = {
    val assign = hrwAssignments(documents.select("doc_id"), NumShards)
    val tot = assign.agg(count(lit(1)).as("total_docs"))
    assign.groupBy("shard").agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("total_docs"),
        (col("n_docs").cast("double") / col("total_docs").cast("double"))
          .as("share"),
        ((col("n_docs") * NumShards).cast("double")
          / col("total_docs").cast("double")).as("skew"))
  }

  /** One-row minimal-motion audit: drop the last shard and require
    * moved == previously-on-removed, key for key. */
  def shardStability(documents: DataFrame): DataFrame = {
    val full = hrwAssignments(documents.select("doc_id"), NumShards)
    val reduced = hrwAssignments(documents.select("doc_id"), NumShards - 1)
      .withColumnRenamed("shard", "shard_reduced")
    full.join(reduced, Seq("doc_id"))
      .agg(
        count(lit(1)).as("n_total"),
        count(when(col("shard") === NumShards - 1, 1)).as("n_on_removed"),
        count(when(col("shard") =!= col("shard_reduced"), 1)).as("n_moved"),
        count(when(col("shard") =!= col("shard_reduced")
          && col("shard") =!= NumShards - 1, 1)).as("n_moved_unnecessarily"))
      .withColumn("minimal_motion",
        col("n_moved") === col("n_on_removed")
          && col("n_moved_unnecessarily") === 0L)
  }
}
