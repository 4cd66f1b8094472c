package graft

import org.apache.spark.sql.functions._
import graft.operators.Compaction

/** Compaction must merge a fragmented directory to the target file
  * count without changing content, and be a no-op when already compact.
  */
class CompactionSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(df.columns.sorted.map(col): _*)

  test("fragmented directory compacts to one file, content preserved") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toFile.getAbsolutePath + "/t"
    val df = spark.range(10000).select(col("id"), (col("id") % 97).as("k"))
    df.repartition(40).write.parquet(dir)
    def nFiles = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFiles === 40)
    val n = Compaction.compactDir(spark, dir)
    assert(n === 1)
    assert(nFiles === 1)
    val back = spark.read.parquet(dir)
    assert(back.count() === 10000)
    assert(canon(back).exceptAll(canon(df)).count() === 0)
    // second call: already compact, no rewrite
    assert(Compaction.compactDir(spark, dir) === 0)
  }
}
