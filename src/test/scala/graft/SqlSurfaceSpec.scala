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

  test("custom native functions are callable from SQL") {
    import org.apache.spark.sql.functions._
    functions.SqlFunctions.register(spark)
    spark.range(1000).select(
        (col("id") % 4).cast("string").as("g"),
        (col("id") * 2654435761L % 97).cast("double").as("s"),
        col("id").as("p"))
      .createOrReplaceTempView("tkv")
    // SQL text and Column API must resolve to the same expression nodes
    val viaSql = spark.sql(
      """select g, e.payload as p, e.score as s
        |from (select g, top_k(s, p, 3) as tk from tkv group by g)
        |lateral view explode(tk) t as e""".stripMargin)
    val viaCol = spark.table("tkv").groupBy("g")
      .agg(graft.expressions.TopKAggregate.top_k(col("s"), col("p"), 3).as("tk"))
      .select(col("g"), explode(col("tk")).as("e"))
      .select(col("g"), col("e.payload").as("p"), col("e.score").as("s"))
    assert(viaSql.exceptAll(viaCol).count() === 0)
    assert(viaCol.exceptAll(viaSql).count() === 0)
    val z = spark.sql("select zorder_key(3L, 5L) as z").head.getLong(0)
    assert(z === 39L)
    val d = spark.sql(
      "select dot_product(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) as d").head.getDouble(0)
    assert(d === 11.0)
    assert(spark.sql("select md5_prefix60('abc') as h").head.getLong(0) ===
      spark.range(1).select(graft.expressions.TextExprs.md5_prefix60(lit("abc")))
        .head.getLong(0))
    assert(spark.sql("select hilbert_key(3L, 5L) as h").head.getLong(0) ===
      graft.expressions.Hilbert.xy2d(3L, 5L))
    assert(spark.sql("select jaro_winkler('martha', 'marhta') as j")
      .head.getDouble(0) === 0.9611111111111111)
  }

  test("marts are catalog tables in the dataset schema") {
    Models.orders(spark, sf) // force materialization + registration
    val db = Mat.schemaFor(sf)
    val tables = spark.sql(s"show tables in $db").collect().map(_.getAs[String]("tableName")).toSet
    assert(tables.contains("orders"))
    assert(spark.sql(s"select count(*) from $db.orders").head.getLong(0) > 0)
  }
}
