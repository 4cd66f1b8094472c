package graft.testing

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Mock-fixture builder for unit tests (SURVEY §5.2): dbt unit tests
  * specify partial rows — unspecified columns default to NULL
  * (reference `orders.yml:35-52`, `order_items.yml:14-41`,
  * `stg_locations.yml:11-43`). `rows` builds a full-schema DataFrame
  * from partial column→value maps the same way.
  */
object Fixtures {
  def rows(spark: SparkSession, schema: StructType, partial: Seq[Map[String, Any]]): DataFrame = {
    val data = partial.map { m =>
      Row.fromSeq(schema.fields.map(f => m.get(f.name).orNull).toSeq)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 1), schema)
  }
}
