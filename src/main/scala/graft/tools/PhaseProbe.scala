package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, xxhash64, bit_xor}

/** Dev probe (r18): split one registered query's wall time into
  * DataFrame construction / analysis+optimization+physical planning /
  * execution, run 3×, to locate the per-query fixed cost the bench
  * tail pays. Not part of the driver contract.
  *
  * Usage: sbt "runMain graft.tools.PhaseProbe <sfDir> <query...>"
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        graft.operators.BoundedWindow.ExcludedRule)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Models.prebuildMarts(spark, sfDir)
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to 3).foreach { pass =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val agged = df.select(xxhash64(df.columns.map(col).toSeq: _*).as("h"))
          .agg(bit_xor(col("h")))
        val t1 = System.nanoTime()
        agged.queryExecution.executedPlan // force analysis+optimization+physical
        val t2 = System.nanoTime()
        agged.collect()
        val t3 = System.nanoTime()
        println(f"$n%-28s pass$pass construct=${(t1 - t0) / 1e9}%6.3f plan=${(t2 - t1) / 1e9}%6.3f exec=${(t3 - t2) / 1e9}%6.3f")
      }
    }
    spark.stop()
  }
}
