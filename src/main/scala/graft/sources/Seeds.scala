package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** S2 seed CSV loader (reference `dbt_project.yml:25-29` + `seeds/
  * jaffle-data`): header CSVs loaded with EXPLICIT schemas — the one
  * place the reference pins column types (`README.md:196-203`), and the
  * one place we don't infer. Distributed `spark.read.csv` replaces
  * dbt's driver-side row shipping (`README.md:219`).
  */
object Seeds {

  /** Fixed on-disk home of the seed-CSV oracle round trip
    * ([[graft.Models.seedCsvRoundtrip]]): the engine writes header CSV
    * here and reloads it through [[load]]; the DuckDB oracle reads the
    * SAME files via read_csv, so the loader itself sits inside the
    * differential gate. Lives under the build's target/ dir
    * (gitignored, inside the repo sandbox). */
  val RoundtripDir = "/root/repo/target/seed_csv/raw_customers"

  /** Raw-table schemas, TPC-H-mapped like the staging layer. */
  val schemas: Map[String, StructType] = Map(
    "raw_customers" -> StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("nation_id", IntegerType), StructField("balance", DoubleType),
      StructField("segment", StringType))),
    "raw_orders" -> StructType(Seq(
      StructField("id", LongType), StructField("customer_id", LongType),
      StructField("status", StringType), StructField("total", DoubleType),
      StructField("ordered_at", TimestampType), StructField("priority", StringType))),
    "raw_stores" -> StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("region_id", IntegerType))),
    "raw_products" -> StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("brand", StringType), StructField("kind", StringType),
      StructField("size", IntegerType), StructField("price", DoubleType))),
    "raw_supplies" -> StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("nation_id", IntegerType), StructField("balance", DoubleType))))

  def load(spark: SparkSession, path: String, table: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(schemas.getOrElse(table, sys.error(s"unknown seed table $table")))
      .csv(path)
}
