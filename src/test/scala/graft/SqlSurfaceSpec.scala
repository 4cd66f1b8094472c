package graft

/** The SQL-facing surface a dbt user expects: models queryable by name
  * with spark.sql, both as temp views (Views.registerAll) and as
  * catalog tables (the Mat schema).
  */
class SqlSurfaceSpec extends SparkSpec {

  test("spark.sql joins registered model views by name") {
    Views.registerAll(spark, sf)
    val n = spark.sql(
      """select count(*) as n
        |from orders o
        |join customers c using (customer_id)
        |where c.count_lifetime_orders > 0""".stripMargin).head.getLong(0)
    assert(n > 0)
    val top = spark.sql(
      "select product_name from products where revenue_rank = 1").count()
    assert(top === 1)
  }

  test("marts are catalog tables in the dataset schema") {
    Models.orders(spark, sf) // force materialization + registration
    val db = Mat.schemaFor(sf)
    val tables = spark.sql(s"show tables in $db").collect().map(_.getAs[String]("tableName")).toSet
    assert(tables.contains("orders"))
    assert(spark.sql(s"select count(*) from $db.orders").head.getLong(0) > 0)
  }
}
