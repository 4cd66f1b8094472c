package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * One reader per table so every query declares its scan explicitly and
  * Catalyst sees a plain parquet relation — column pruning and predicate
  * pushdown reach the scan (`PushedFilters` / `ReadSchema` in explain).
  * At 100 TB these would be partitioned catalog tables; the reader funcs
  * are the single seam where that swap happens.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scan-split sizing stays at Spark defaults — examined r18: every
    * testdata file is a single parquet row group, so sub-default
    * maxPartitionBytes adds only empty tasks on raw scans while
    * fragmenting multi-file mart reads (measured; see
    * OPTIMIZATION_r18.md "examined, deliberately left alone"). */

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")
  /** events.parquet has shipped `ts` in two physical shapes so far:
    * TIMESTAMP(NANOS), which Spark's parquet reader rejects unless
    * spark.sql.legacy.parquet.nanosAsLong makes it arrive as nanosecond
    * longs (converted here with exact integer division, matching
    * DuckDB's ns→µs truncation), and plain timestamp[us] without a tz
    * annotation, which arrives as TimestampNTZ. Both are normalized to
    * session-tz TimestampType micros — sessions pin UTC, so the NTZ
    * cast is value-preserving and every downstream consumer (typed
    * Datasets with java.sql.Timestamp fields, stream/batch exceptAll
    * twins) sees ONE ts type regardless of which file shape the
    * testdata generator produced. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = read(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", raw.col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
