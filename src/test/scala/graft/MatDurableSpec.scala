package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger

/** Durable (cross-JVM) mart versioning through the [[MatLog]]
  * transaction log — VERDICT r10 #1's done-criteria:
  *
  *  1. a mart committed in THIS session is adopted by a SECOND
  *     SparkSession with a fresh applicationId (a real subprocess JVM,
  *     [[tools.DurableSession]]) without forcing the build thunk;
  *  2. the month-partitioned + bucketed variant round-trips through
  *     the commit record's DDL (partition recovery, bucket spec);
  *  3. `stream_sink_merge`'s query survives a cross-JVM restart with
  *     the SAME checkpoint: committed batches are skipped AND the mart
  *     they built is still there to upsert into — the crash-recovery
  *     hole the in-memory registry had.
  */
class MatDurableSpec extends SparkSpec {
  import spark.implicits._

  private def md5key(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)

  private def lastCommitted(logRoot: String, sfKey: String, name: String): Int = {
    val dir = s"$logRoot/${md5key(sfKey)}/$name/_log"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    MatLog.lastCommittedVersion(fs, dir)
  }

  // same JDK-17 module flags the build forks Spark with
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Fork a REAL second JVM (fresh applicationId by construction). */
  private def runChild(args: String*): Int = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.DurableSession") ++ args
    import scala.sys.process._
    Process(cmd).!
  }

  test("fresh JVM adopts a committed mart from the log without rebuilding") {
    val logRoot = Files.createTempDirectory("graft-durlog").toString
    val sfKey = s"durable-ds-${System.nanoTime}"
    spark.conf.set(Mat.LogRootConf, logRoot)
    try {
      var builds = 0
      val df = Mat.table(spark, sfKey, "durable_demo") {
        builds += 1
        spark.range(10).selectExpr("id", "id * 2 as twice")
      }
      assert(builds == 1 && df.count() == 10)
      assert(lastCommitted(logRoot, sfKey, "durable_demo") == 1)
      // same session, second call: cached, thunk not forced
      Mat.table(spark, sfKey, "durable_demo")(fail("must not rebuild in-session")): Unit
      // SECOND SparkSession (subprocess JVM): adopt, never build
      assert(runChild("read", logRoot, sfKey, "durable_demo", "1", "10") == 0,
        "child JVM failed to adopt the committed mart (see stderr above)")
    } finally spark.conf.unset(Mat.LogRootConf)
  }

  test("month-partitioned + bucketed mart round-trips through the commit DDL") {
    val logRoot = Files.createTempDirectory("graft-durlog").toString
    val sfKey = s"durable-ds-${System.nanoTime}"
    spark.conf.set(Mat.LogRootConf, logRoot)
    try {
      val data = Seq(
        (1L, java.sql.Timestamp.valueOf("2025-01-05 10:00:00"), 1.0),
        (2L, java.sql.Timestamp.valueOf("2025-02-11 11:00:00"), 2.0),
        (3L, java.sql.Timestamp.valueOf("2025-03-20 12:00:00"), 3.0),
        (4L, java.sql.Timestamp.valueOf("2025-03-21 13:00:00"), 4.0),
      ).toDF("k", "d", "v")
      val df = Mat.table(spark, sfKey, "durable_months",
        timeKey = Some("d"), bucketBy = Some(("k", 4)))(data)
      assert(df.count() == 4)
      // refresh publishes v2 (the dbt-run rebuild path, still durable)
      Mat.refresh(spark, sfKey, "durable_months",
        timeKey = Some("d"), bucketBy = Some(("k", 4)))(data): Unit
      assert(lastCommitted(logRoot, sfKey, "durable_months") == 2)
      assert(runChild("read", logRoot, sfKey, "durable_months", "2", "4") == 0,
        "child JVM failed to adopt the partitioned/bucketed mart")
    } finally spark.conf.unset(Mat.LogRootConf)
  }

  test("mergeSink restart in a fresh JVM: checkpoint skips committed batches, mart survives") {
    val logRoot = Files.createTempDirectory("graft-durlog").toString
    val scratch = Files.createTempDirectory("graft-durmerge")
    val ingest = scratch.resolve("ingest").toString
    val ckpt = scratch.resolve("ckpt").toString
    val sfKey = s"durable-ds-${System.nanoTime}"
    val name = "durable_user_latest"
    spark.conf.set(Mat.LogRootConf, logRoot)
    try {
      // delivery 1: users 1 and 2 (user 1 has two events; ts=2000 wins)
      Seq((1L, 101L, 1000L, 1.0), (2L, 102L, 1500L, 2.0), (1L, 103L, 2000L, 3.0))
        .toDF("user_id", "event_id", "ts", "value")
        .coalesce(1).write.mode("append").parquet(ingest)
      val stream = spark.readStream
        .schema("user_id long, event_id long, ts long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(ingest)
      val q = streaming.Streams.mergeSink(stream, sfKey, name, "user_id", "ts", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(lastCommitted(logRoot, sfKey, name) == 1, "delivery 1 must commit v1")
      // delivery 2 lands while the pipeline is "down": update user 2, add user 3
      Seq((2L, 104L, 3000L, 9.0), (3L, 105L, 3500L, 7.0))
        .toDF("user_id", "event_id", "ts", "value")
        .coalesce(1).write.mode("append").parquet(ingest)
      // restart in a fresh JVM with the SAME checkpoint: must process
      // ONLY delivery 2 (batch 0 committed) against the adopted mart,
      // and the child asserts the final snapshot = last event per user
      assert(runChild("merge-restart", logRoot, sfKey, ingest, ckpt, name) == 0,
        "child JVM merge restart failed (see stderr above)")
      // the child UPSERTED (v2), not rebuilt-from-scratch
      assert(lastCommitted(logRoot, sfKey, name) == 2)
    } finally spark.conf.unset(Mat.LogRootConf)
  }
}
