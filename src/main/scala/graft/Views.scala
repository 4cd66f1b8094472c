package graft

import org.apache.spark.sql.SparkSession

/** SQL-facing surface: a reference (dbt) user works in SQL, so every
  * registered query/model is exposed as a temp view named like the
  * model — `spark.sql("select ... from orders join customers ...")`
  * works after one call. The Mat-materialized marts are ADDITIONALLY
  * catalog tables under `Mat.schemaFor(sfDir)` (external, partitioned),
  * so warehouse-style `schema.table` references work too; views cover
  * the lazy staging layer and computed queries uniformly.
  */
object Views {
  /** Register every SparkEntry query as a temp view over `sfDir`. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    SparkEntry.queries.foreach { case (name, fn) =>
      fn(spark, sfDir).createOrReplaceTempView(name)
    }
}
