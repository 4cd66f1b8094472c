package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of registered queries —
  * the ".explain and iterate" loop for plan audits (pushed filters,
  * ReadSchema pruning, WholeStageCodegen spans, join strategies,
  * absence of single-partition exchanges).
  *
  * Usage: sbt "runMain graft.Explain <sfDir> [queryName ...]"
  * (no names = every registered query).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        graft.operators.BoundedWindow.ExcludedRule)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"[explain] $n failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
