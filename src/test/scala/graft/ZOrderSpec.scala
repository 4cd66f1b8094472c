package graft

import org.apache.spark.sql.functions._
import graft.expressions.ZOrder

/** Morton key correctness (hand-computed values + the SQL mask-ladder
  * mirror) and the property the layout exists for: files cut from a
  * zkey-sorted order have narrow min/max spans on BOTH dimensions.
  */
class ZOrderSpec extends SparkSpec {

  test("known Morton values") {
    import spark.implicits._
    val df = Seq((3L, 5L), (0L, 0L), (65535L, 0L), (0L, 65535L), (1L, 1L))
      .toDF("x", "y")
      .select(ZOrder.zorder_key(col("x"), col("y")).as("z")).as[Long]
    // x=3,y=5: bits x→5, y→17·2=34 → 39; spread(0xFFFF)=0x55555555
    assert(df.collect().toSeq === Seq(39L, 0L, 0x55555555L, 0xAAAAAAAAL, 3L))
  }

  test("expression == SQL mask ladder (oracle parity within Spark)") {
    val df = spark.range(5000).select(
      (col("id") % 311).as("x"), (col("id") % 4099).as("y"))
    val diff = df.select(
        ZOrder.zorder_key(col("x"), col("y")).as("a"),
        expr(ZOrder.zorderSql("x", "y")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("zkey-sorted chunks have narrow spans on BOTH dimensions") {
    // uniform 64×64 grid → 16 contiguous zkey chunks are the 16
    // 16×16 quadrants: per-chunk span ≈ 15 of global 63 on each axis
    val grid = spark.range(4096).select(
      (col("id") % 64).as("x"), expr("id div 64").as("y"))
    val chunked = grid
      .withColumn("z", ZOrder.zorder_key(col("x"), col("y")))
      .withColumn("chunk", ntile(16).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("z"))))
    val spans = chunked.groupBy("chunk")
      .agg((max(col("x")) - min(col("x"))).as("sx"),
        (max(col("y")) - min(col("y"))).as("sy"))
      .agg(avg(col("sx")).as("ax"), avg(col("sy")).as("ay"))
      .head()
    assert(spans.getDouble(0) < 0.3 * 63, s"x spans too wide: $spans")
    assert(spans.getDouble(1) < 0.3 * 63, s"y spans too wide: $spans")
  }

  test("zorder layout compaction contracts per-FILE spans on both dims") {
    // shuffled 64×64 grid written as many unclustered files, then
    // compacted with the Morton key as the layout: each rewritten
    // file must cover a narrow range of BOTH x and y
    val dir = java.nio.file.Files.createTempDirectory("zorder-compact").toString
    val grid = spark.range(16384).select(
        (col("id") % 128).as("x"), expr("id div 128").as("y"),
        // shuffle the write order so unclustered files span everything
        expr("hash(id)").as("h"))
      .repartition(8, col("h")).drop("h")
    grid.write.mode("overwrite").parquet(dir)
    // aim for ~16 files: each ideally a 32×32 Morton quadrant
    val total = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val n = operators.Compaction.compactDir(spark, dir,
      targetBytes = math.max(1L, total / 16),
      layout = Seq(ZOrder.zorder_key(col("x"), col("y"))))
    assert(n >= 8, s"layout rewrite produced only $n files")
    val perFile = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg((max(col("x")) - min(col("x"))).as("sx"),
        (max(col("y")) - min(col("y"))).as("sy"))
      .agg(avg(col("sx")).as("ax"), avg(col("sy")).as("ay"))
      .head()
    // ~16 ideal quadrant files span 31; range-sample boundary files
    // span more — but far below the ~127 every unclustered file covers
    assert(perFile.getDouble(0) < 0.5 * 127, s"x file spans too wide: $perFile")
    assert(perFile.getDouble(1) < 0.5 * 127, s"y file spans too wide: $perFile")
  }

  test("zonemap catalog: every row in exactly one file, balanced cuts, sane ranges") {
    import spark.implicits._
    val events = (1L to 1000L).map { i =>
      (i, new java.sql.Timestamp(86400000L * (i % 30)), i % 7,
        "click", (i % 300).toDouble, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val zm = marts.EventMarts.zorderZonemaps(events).collect()
    assert(zm.length === marts.EventMarts.ZonemapFiles)
    assert(zm.map(_.getLong(1)).sum === 1000L)
    // ntile balance: file sizes differ by at most 1
    val sizes = zm.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    zm.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3)) // value min <= max
      assert(r.getLong(4) <= r.getLong(5)) // day   min <= max
      assert(r.getLong(6) <= r.getLong(7)) // zkey  min <= max
    }
    // files are zkey-ordered: file 1 holds the highest keys; a tied
    // zkey may straddle a boundary (rank tiebreak is event_id) but
    // ranges never invert
    val byId = zm.sortBy(_.getInt(0))
    byId.sliding(2).foreach {
      case Array(hi, lo) =>
        assert(hi.getLong(6) >= lo.getLong(7),
          s"zkey ranges invert between files ${hi.getInt(0)} and ${lo.getInt(0)}")
      case _ => ()
    }
  }

  test("weightedSample is deterministic, bounded, and a subset") {
    val docs = Tables.documents(spark, sf)
    val a = llm.Splits.weightedSample(docs)
    val b = llm.Splits.weightedSample(docs)
    assert(a.exceptAll(b).count() === 0)
    val perStratum = a.groupBy("source").count()
      .filter(col("count") > llm.Splits.WeightedK).count()
    assert(perStratum === 0)
    assert(a.join(docs, Seq("doc_id"), "left_anti").count() === 0)
  }
}
