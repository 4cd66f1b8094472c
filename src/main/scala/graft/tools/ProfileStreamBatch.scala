package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: wall-clock attribution for the stream_hybrid_index
  * foreachBatch body — which of the three index writes (postings /
  * vectors / bands) eats the ~2.3 s per 500-row micro-batch the bench
  * shows, and how much is write-job overhead vs expression work.
  *
  * Usage: sbt "runMain graft.tools.ProfileStreamBatch <sfDir>"
  */
object ProfileStreamBatch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        graft.operators.BoundedWindow.ExcludedRule)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.HashEmbed
    val out = java.nio.file.Files.createTempDirectory("profbatch").toString
    graft.Models.prebuildMarts(spark, sfDir)
    val standVecs = graft.Models.semVectors(spark, sfDir)
      .filter(col("doc_id") % 5 =!= 0)
    val pinnedLazy = HashEmbed.semStats(standVecs)
    // eager variant: quantizer state collected once to a literal row
    val pinnedRow = pinnedLazy.collect().head
    val pinned = spark.createDataFrame(
      java.util.Arrays.asList(pinnedRow), pinnedRow.schema)
    def run(tag: String, parts: Int): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val batch0 = graft.Tables.documents(spark, sfDir)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .filter(col("doc_id") % 5 === 0 && col("doc_id") % 2 === 0)
      def t(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        System.err.println(f"[profile:$tag] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      t("whole-batch-body") {
        val batch = batch0.persist()
        val vecs = HashEmbed.vectors(HashEmbed.hashedEmbeddings(batch)).persist()
        try {
          t("postings-write") {
            HashEmbed.postings(batch)
              .write.mode("overwrite").parquet(s"$out/$tag/postings")
          }
          t("vectors-write") {
            vecs.write.mode("overwrite").parquet(s"$out/$tag/vectors")
          }
          t("bands-write") {
            HashEmbed.semBandTable(vecs, pinned)
              .write.mode("overwrite").parquet(s"$out/$tag/bands")
          }
        } finally { vecs.unpersist(): Unit; batch.unpersist(): Unit }
      }
    }
    for (pass <- 1 to 3; parts <- Seq(32, 4))
      run(s"parts$parts-pass$pass", parts)
    spark.stop()
  }
}
