package graft.operators

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet directories — the maintenance
  * operator every long-lived 100 TB table needs (Delta/Iceberg call it
  * OPTIMIZE / rewrite_data_files; with plain parquet it is a rewrite).
  *
  * Why it matters at scale: streaming sinks and incremental writes
  * accumulate files far below the ideal scan unit; every file costs a
  * task, a footer read, and a listing entry, so a million 1 MB files
  * makes a table unscannable long before capacity is the problem.
  * Compaction rewrites a directory to ceil(totalBytes / targetBytes)
  * files.
  *
  * The rewrite stages into a sibling temp directory, then swaps via
  * two renames (dir moves on the same filesystem). The swap is NOT
  * atomic against concurrent readers — that gap is exactly what an
  * ACID table format closes (see README "Table format status"); for
  * Mat's session-scoped marts and streaming sink outputs it is the
  * right standalone tool.
  */
object Compaction {

  val DefaultTargetBytes: Long = 128L * 1024 * 1024

  private def parquetFiles(dir: File): Seq[File] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.endsWith(".parquet"))
  }

  /** Compact `dir` to ~targetBytes files. Returns the resulting file
    * count, or 0 if the directory was already at or below it (no
    * rewrite performed — compaction must be cheap to call on a
    * schedule). */
  def compactDir(spark: SparkSession, dir: String,
                 targetBytes: Long = DefaultTargetBytes): Int = {
    val d = new File(dir)
    val files = parquetFiles(d)
    if (files.isEmpty) return 0
    // refuse Hive-partitioned roots: a flat rewrite would fold the
    // partition column into the data files and orphan the catalog's
    // partition locations (reads silently return nothing). Compact the
    // LEAF partition directories individually instead.
    val partitioned = files.exists(
      _.getAbsolutePath.drop(d.getAbsolutePath.length).contains("="))
    require(!partitioned,
      s"$dir contains partition subdirectories (k=v); compact each leaf partition directory instead")
    val total = files.map(_.length()).sum
    val want = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    if (files.size <= want) return 0
    val tmp = new File(d.getParentFile, d.getName + ".__compacting")
    // coalesce, not repartition: merging files needs no shuffle
    spark.read.parquet(dir).coalesce(want)
      .write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val old = new File(d.getParentFile, d.getName + ".__old")
    Files.move(Paths.get(d.getAbsolutePath), Paths.get(old.getAbsolutePath),
      StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp.getAbsolutePath), Paths.get(d.getAbsolutePath),
      StandardCopyOption.ATOMIC_MOVE)
    def rm(f: File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(): Unit
    }
    rm(old)
    parquetFiles(d).size
  }
}
