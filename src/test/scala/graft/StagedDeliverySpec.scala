package graft.streaming

import org.apache.hadoop.fs.Path

/** The crash/concurrency contract of the two-batch delivery staging
  * (ADVICE r12 #5): deliveries publish by an ATOMIC directory rename,
  * so a mid-staging crash leaves only an invisible temp directory
  * (clean retry), orphaned temp dirs never leak into the listing the
  * file source reads, staging is stage-once (the build thunk is not
  * re-forced), and two racing first-runs of the same inKey publish
  * exactly one delivery set. */
class StagedDeliverySpec extends graft.SparkSpec {

  private val schemaDdl = "id long"

  private def inDirOf(inKey: String): java.nio.file.Path =
    java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), inKey,
      spark.sparkContext.applicationId,
      sf.replaceAll("[^A-Za-z0-9]", "_"))

  private def scratch(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-stagespec-$tag").toString

  test("orphaned temp dir from a simulated crash is invisible; staging retries clean") {
    import spark.implicits._
    val inKey = "graft-stagespec-crash"
    val inDir = inDirOf(inKey)
    // simulate a crash: a leftover temp dir beside the (absent) inDir
    val dead = java.nio.file.Paths.get(inDir.toString + ".tmp-deadbeef")
    java.nio.file.Files.createDirectories(dead)
    java.nio.file.Files.write(dead.resolve("junk.parquet"), Array[Byte](1, 2, 3))
    var builds = 0
    def build = { builds += 1; Seq(Seq(1L).toDF("id"), Seq(2L).toDF("id")) }
    Streams.stagedTwoBatch(spark, inKey, sf, scratch("crash"), schemaDdl)(build)
    assert(builds === 1)
    val fs = new Path(inDir.toString).getFileSystem(
      spark.sessionState.newHadoopConf())
    val files = fs.listStatus(new Path(inDir.toString))
      .map(s => s.getPath.getName -> s.getModificationTime).sortBy(_._1)
    assert(files.map(_._1).toSeq === Seq("b0.parquet", "b1.parquet"))
    // ascending fixed mtimes: delivery order is deterministic
    assert(files(0)._2 < files(1)._2)
    // the orphan is still there (never cleaned by someone else's run)
    // and still outside the published listing
    assert(java.nio.file.Files.exists(dead))
    // second call adopts the published staging without re-forcing build
    Streams.stagedTwoBatch(spark, inKey, sf, scratch("crash2"), schemaDdl)(build)
    assert(builds === 1)
  }

  test("two racing first-runs of one inKey publish exactly one delivery set") {
    import spark.implicits._
    val inKey = "graft-stagespec-race"
    val inDir = inDirOf(inKey)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { i =>
      new Thread(() => {
        try
          Streams.stagedTwoBatch(spark, inKey, sf, scratch(s"race$i"), schemaDdl) {
            builds.incrementAndGet()
            Seq(Seq(1L).toDF("id"), Seq(2L).toDF("id"))
          }: Unit
        catch { case t: Throwable => errs.add(t): Unit }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    assert(errs.isEmpty, s"racing staging threw: ${errs.toArray.toSeq}")
    val fs = new Path(inDir.toString).getFileSystem(
      spark.sessionState.newHadoopConf())
    val names = fs.listStatus(new Path(inDir.toString))
      .map(_.getPath.getName).sorted
    assert(names.toSeq === Seq("b0.parquet", "b1.parquet"),
      s"published delivery set polluted: ${names.toSeq}")
  }
}
