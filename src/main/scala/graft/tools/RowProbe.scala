package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r18): isolate the per-row cost layers of the staging
  * projection over lineitem. Not part of the driver contract. */
object RowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.lineitem(spark, sfDir)
    def time(tag: String)(df: => DataFrame): Unit = (1 to 3).foreach { p =>
      val t0 = System.nanoTime()
      val d = df
      d.select(xxhash64(d.columns.map(col).toSeq: _*).as("h")).agg(bit_xor(col("h"))).collect()
      println(f"$tag%-28s pass$p ${(System.nanoTime() - t0) / 1e9}%6.3f  parts=${d.rdd.getNumPartitions}")
    }
    time("raw_count") { li.select(col("l_orderkey")) }
    time("raw_allcols") { li }
    time("stg_no_md5") {
      graft.staging.Staging.stgOrderItems(li).drop("order_item_id") }
    time("stg_full") { graft.staging.Staging.stgOrderItems(li) }
    time("stg_full_presented") {
      graft.Out.presentDoubles(graft.staging.Staging.stgOrderItems(li)) }
    spark.stop()
  }
}
