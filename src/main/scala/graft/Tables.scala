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

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects; sessions set spark.sql.legacy.parquet.nanosAsLong,
    * so ts arrives as nanosecond longs and is converted here with exact
    * integer division (matching DuckDB's ns→µs truncation). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = read(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
