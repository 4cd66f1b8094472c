package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.testing.DataTests._

/** The reference's declared data-test suite (SURVEY §5.1 — 25 generic
  * test instances across the staging/mart ymls), run table-driven
  * through the DataTests library. Adaptations from the TPC-H mapping
  * are noted inline.
  */
class ReferenceDataTestsSpec extends SparkSpec {

  private def m(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  // unique + not_null primary keys (stg_*.yml, <mart>.yml)
  private val primaryKeys = Seq(
    "stg_customers" -> "customer_id",
    "stg_orders" -> "order_id",
    "stg_order_items" -> "order_item_id",
    "stg_products" -> "product_id",
    "stg_locations" -> "location_id",
    // stg_supplies grain is per supply-cost row (stg_supplies.yml:3-6)
    "stg_supplies" -> "supply_uuid",
    "orders" -> "order_id",
    "customers" -> "customer_id",
    "order_items" -> "order_item_id",
    "products" -> "product_id",
    "locations" -> "location_id",
    // supplies mart: "one row per supply" — the full grain key
    "supplies" -> "supply_uuid",
    "customer_segmentation" -> "customer_id",
    "time_analytics" -> "date_day")

  primaryKeys.foreach { case (model, key) =>
    test(s"$model.$key: not_null + unique") {
      val df = m(model)
      assert(notNull(df, key) === 0, s"$model.$key nulls")
      assert(unique(df, key) === 0, s"$model.$key dupes")
    }
  }

  test("relationships: orders.customer_id -> stg_customers.customer_id (orders.yml:20-23)") {
    assert(relationships(m("orders"), "customer_id", m("stg_customers"), "customer_id") === 0)
  }

  test("relationships: order_items.order_id -> orders.order_id (order_items.yml:10-13)") {
    assert(relationships(m("order_items"), "order_id", m("orders"), "order_id") === 0)
  }

  test("relationships: stg_order_items.order_id -> stg_orders.order_id (stg_order_items.yml:14-17)") {
    assert(relationships(m("stg_order_items"), "order_id", m("stg_orders"), "order_id") === 0)
  }

  test("accepted_values: customers.customer_type in {new, returning} (customers.yml:31-33)") {
    assert(acceptedValues(m("customers"), "customer_type", Seq("new", "returning")) === 0)
  }

  // Arithmetic invariants run on the DECIMAL surface (Models.*): the
  // driver-facing output presents doubles, where exact identities like
  // a - b = c no longer hold bit-wise after independent rounding.
  test("expression_is_true: stg_orders order_total - tax_paid = subtotal (stg_orders.yml:4-7)") {
    assert(expressionIsTrue(Models.stgOrders(spark, sf),
      col("order_total") - col("tax_paid") === col("subtotal")) === 0)
  }

  test("expression_is_true: orders order_total = subtotal + tax_paid (orders.yml:4-10)") {
    // the companion invariant (order_items_subtotal = subtotal) holds on
    // jaffle data by construction but not under the TPC-H mapping,
    // where item revenue is independent of the synthetic tax split —
    // documented adaptation.
    assert(expressionIsTrue(Models.orders(spark, sf),
      col("order_total") === col("subtotal") + col("tax_paid")) === 0)
  }

  test("expression_is_true: customers pretax + tax = lifetime_spend (customers.yml:4-7)") {
    assert(expressionIsTrue(Models.customers(spark, sf),
      col("lifetime_spend_pretax") + col("lifetime_tax_paid") === col("lifetime_spend")) === 0)
  }

  test("source freshness: orders.ordered_at within range of the pinned clock (__sources.yml:12-13)") {
    assert(freshness(m("stg_orders"), "ordered_at",
      graft.functions.Funcs.runDate, maxAgeDays = 30) === 0)
  }
}
