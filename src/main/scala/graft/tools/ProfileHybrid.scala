package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: per-arm wall-clock attribution for the hybrid retrieval
  * stack (lexical list / semantic list / fusion / recall baseline) —
  * the measure-don't-guess loop behind plan work on hybrid_search.
  *
  * Usage: sbt "runMain graft.tools.ProfileHybrid <sfDir>"
  */
object ProfileHybrid {
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
    def time(name: String)(df: => DataFrame): Unit = {
      val d = df
      d.queryExecution.executedPlan // analyze
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = d.count()
        System.err.println(f"[profile] $name pass$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    // warm the Mats
    graft.Models.prebuildMarts(spark, sfDir)
    val topTerms = graft.Models.tfidfTopTerms(spark, sfDir)
    val impact = graft.Models.hybridImpact(spark, sfDir)
    val vecs = graft.Models.semVectors(spark, sfDir)
    val bands = graft.Models.semBandIndex(spark, sfDir)
    import graft.llm.HashEmbed
    val qt = topTerms.filter(col("doc_id") % 29 === 3 && col("doc_id") < HashEmbed.QueryIdBound)
      .select(col("doc_id").as("query_doc_id"), col("term"), col("rank"))
    time("mat_reads_only")(impact.select(col("doc_id")).unionByName(bands.select(col("doc_id"))))
    time("lex_arm")(HashEmbed.lexTopList(qt, impact))
    time("sem_candidates") {
      val qBands = bands.filter(col("doc_id") % 29 === 3 && col("doc_id") < HashEmbed.QueryIdBound)
        .select(col("doc_id").as("query_doc_id"), col("band"), col("bkt"))
      bands.join(broadcast(qBands), Seq("band", "bkt"))
        .filter(col("doc_id") =!= col("query_doc_id"))
        .select("query_doc_id", "doc_id").distinct()
    }
    time("hybrid_search")(graft.Models.hybridSearch(spark, sfDir))
    time("hybrid_recall")(graft.Models.hybridRecall(spark, sfDir))
    spark.stop()
  }
}
