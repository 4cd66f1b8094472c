package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, countDistinct, lit}

/** dbt `incremental` materialization, MERGE strategy — the default
  * incremental strategy on warehouses with MERGE support, complementing
  * [[Incremental]]'s insert_overwrite (the partition-replace path).
  * Upsert semantics: rows of the batch whose unique key exists in the
  * target REPLACE the stored row; new keys append; untouched rows
  * survive verbatim.
  *
  * Plain parquet has no row-level MERGE, so this composes the versioned
  * [[graft.Mat]] layout: anti-join the current version against the
  * batch (drop the rows being replaced), union the batch, publish as
  * the NEXT version behind the atomically-repointed view. Readers of
  * the previous version keep their snapshot (MatSwapSpec semantics);
  * the swap is one catalog operation. On a Delta/Iceberg classpath the
  * same call maps to a native `MERGE INTO` — Mat's writer is the seam.
  *
  * Scale: one shuffled anti-join on the unique key + a write of the
  * surviving rows. That is O(table) I/O per merge — the price of
  * row-level upserts without a table format's delete files; when the
  * key correlates with a partition column, prefer insert_overwrite
  * (O(affected partitions)). The anti-join shuffles only the key from
  * the batch side when AQE broadcasts the (typically small) batch.
  */
object Merge {

  // serializes the read-modify-write per (app, sfDir, mart) WITHIN this
  // JVM, mirroring Mat's buildLock convention: without it, two
  // concurrent upserts both pin version n and the second publish
  // silently drops the first batch's changes (lost update). Cross-JVM
  // writers need external coordination — the same caveat Mat documents.
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), Object]()

  /** Merge `batch` into mart `name` by `uniqueKey` and publish the
    * result as the mart's next version; returns the merged DataFrame
    * as read back through the stable view. The mart must already have
    * a built version (merge into nothing is a plain build — use
    * [[graft.Mat.table]]). */
  def upsert(spark: SparkSession, sfDir: String, name: String,
             uniqueKey: String, batch: DataFrame): DataFrame = {
    val lock = locks.computeIfAbsent(
      (spark.sparkContext.applicationId, sfDir, name), _ => new Object)
    lock.synchronized {
      require(graft.Mat.currentVersion(spark, sfDir, name) > 0,
        s"$name has no built version to merge into; use Mat.table for the first build")
      val current = graft.Mat.tableVersion(spark, sfDir, name,
        graft.Mat.currentVersion(spark, sfDir, name))
      require(batch.columns.sameElements(current.columns),
        s"merge batch schema ${batch.columns.toSeq} must match target ${current.columns.toSeq}")
      // key-integrity guard (warehouse MERGE errors on multi-match; NULL
      // never joins): a duplicate batch key would anti-join the stored
      // row away and union BOTH duplicates in; a null batch key can
      // never replace anything and would accumulate one orphan row per
      // merge. One small aggregation job on the batch.
      val s = batch.agg(
        count(lit(1)).as("rows"),
        count(col(uniqueKey)).as("nonnull"),
        countDistinct(col(uniqueKey)).as("distinct")).head()
      require(s.getLong(0) == s.getLong(1),
        s"merge batch has null $uniqueKey values; MERGE requires a total key")
      require(s.getLong(1) == s.getLong(2),
        s"merge batch has duplicate $uniqueKey values; MERGE requires a unique key per batch")
      // a left_anti join preserves the left side's columns and order
      val kept = current.join(batch.select(col(uniqueKey)), Seq(uniqueKey), "left_anti")
      graft.Mat.refresh(spark, sfDir, name)(kept.union(batch))
    }
  }

  /** Row-level DELETE by key through the same versioned layout — the
    * "right to be forgotten" maintenance path: publish a new version
    * WITHOUT the given keys (one anti-join + write), leave every prior
    * version's files untouched for in-flight readers, and let the
    * retention prune age the pre-delete versions out (after which the
    * deleted rows exist nowhere — the point of the request). The
    * [[graft.operators.ChangeFeed]] between the two versions shows
    * exactly the deleted rows as `delete` pre-images while both
    * versions are retained. Returns the surviving mart as read back
    * through the stable view. Maps to `DELETE FROM … WHERE key IN …`
    * on a table-format classpath.
    *
    * Scale: one shuffled anti-join + O(table) write, like [[upsert]];
    * the keys side is typically tiny (AQE broadcasts it). */
  def deleteKeys(spark: SparkSession, sfDir: String, name: String,
                 uniqueKey: String, keys: DataFrame): DataFrame = {
    val lock = locks.computeIfAbsent(
      (spark.sparkContext.applicationId, sfDir, name), _ => new Object)
    lock.synchronized {
      require(graft.Mat.currentVersion(spark, sfDir, name) > 0,
        s"$name has no built version to delete from")
      val current = graft.Mat.tableVersion(spark, sfDir, name,
        graft.Mat.currentVersion(spark, sfDir, name))
      val kept = current.join(
        keys.select(col(uniqueKey)).na.drop().distinct(),
        Seq(uniqueKey), "left_anti")
      graft.Mat.refresh(spark, sfDir, name)(kept)
    }
  }
}
