package graft

import org.apache.spark.sql.functions._

/** Invariant tests mirroring the reference's strongest data tests
  * (reference `models/marts/orders.yml:4-10`, `customers.yml:4-7`,
  * `stg_orders.yml:4-7`) plus key-uniqueness checks (SURVEY.md §5.1).
  */
class CoreMartsSpec extends SparkSpec {

  test("stg_orders: order_total - tax_paid = subtotal (expression_is_true)") {
    val bad = Models.stgOrders(spark, sf)
      .filter(col("order_total") - col("tax_paid") =!= col("subtotal")).count()
    assert(bad === 0)
  }

  test("orders: unique + not_null primary key") {
    val o = Models.orders(spark, sf)
    assert(o.filter(col("order_id").isNull).count() === 0)
    assert(o.groupBy("order_id").count().filter(col("count") > 1).count() === 0)
  }

  test("orders: customer_order_number is a 1-based dense sequence") {
    val o = Models.orders(spark, sf)
    val perCust = o.groupBy("customer_id")
      .agg(min("customer_order_number").as("mn"),
        max("customer_order_number").as("mx"), count(lit(1)).as("n"))
    assert(perCust.filter(col("mn") =!= 1 || col("mx") =!= col("n")).count() === 0)
  }

  test("orders: item counts reconcile with order_items mart") {
    val oi = Models.orderItems(spark, sf).groupBy("order_id")
      .agg(count(lit(1)).as("n"))
    val o = Models.orders(spark, sf).select("order_id", "count_order_items")
    val bad = o.join(oi, Seq("order_id"), "left")
      .filter(coalesce(col("n"), lit(0L)) =!= col("count_order_items")).count()
    assert(bad === 0)
  }

  test("customers: lifetime_spend_pretax + lifetime_tax_paid = lifetime_spend") {
    val bad = Models.customers(spark, sf)
      .filter(col("lifetime_spend_pretax") + col("lifetime_tax_paid")
        =!= col("lifetime_spend")).count()
    assert(bad === 0)
  }

  test("customers: customer_type accepted values") {
    val bad = Models.customers(spark, sf)
      .filter(!col("customer_type").isin("new", "returning")).count()
    assert(bad === 0)
  }

  test("order_items: relationships — every order_id exists in orders (left-anti empty)") {
    val bad = Models.orderItems(spark, sf)
      .join(Models.stgOrders(spark, sf), Seq("order_id"), "left_anti").count()
    assert(bad === 0)
  }

  test("entry: flagship query returns rows") {
    assert(SparkEntry.entry(spark).limit(5).count() > 0)
  }

  test("queries and oracleSql keys align") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without queries: ${o.diff(q)}")
  }
}
