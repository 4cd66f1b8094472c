package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dump the EXECUTED (final adaptive) physical plan of registered
  * queries — unlike graft.Explain's pre-execution view, this shows
  * what actually ran: AQE join rewrites, coalesced reads, and
  * ReusedExchange stage dedup (invisible in the static plan).
  *
  * Usage: runMain graft.tools.ExplainExecuted <sfDir> <outDir> <query...> */
object ExplainExecuted {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSeq
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
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    // the noop write runs through its own QueryExecution; a listener is
    // the only way to see the FINAL adaptive plan (stage reuse, AQE
    // join rewrites) that actually executed
    val last = new java.util.concurrent.atomic.AtomicReference[String]("")
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        last.set(qe.executedPlan.toString)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    })
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(1500) // listener bus is async
      val p = last.get
      Files.write(Paths.get(outDir, s"${n}_executed.txt"), p.getBytes("UTF-8"))
      val ex = p.linesIterator.count(l => l.contains("Exchange") &&
        !l.contains("BroadcastExchange") && !l.contains("ReusedExchange"))
      val ru = p.linesIterator.count(_.contains("Reused"))
      val sc = p.linesIterator.count(_.contains("Scan parquet"))
      println(s"[executed] $n shuffleExchanges=$ex reused=$ru parquetScans=$sc")
    }
    spark.stop()
  }
}
