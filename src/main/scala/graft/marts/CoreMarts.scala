package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Funcs._

/** Core marts: order_items → orders → customers (SURVEY.md §7.2 steps 2-3).
  * Pure functions over staging DataFrames; the model DAG is just function
  * application, lazily composed into one Catalyst plan per output
  * (reference `models/marts/{order_items,orders,customers}.sql`).
  */
object CoreMarts {
  private def dec18(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
  private def dec184(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))

  /** order_items mart (reference `models/marts/order_items.sql`):
    * J2 ⟕ orders (order date), J3 ⟕ products (broadcast — dim table),
    * J4 ⟕ supply-cost rollup (A2). All single-key LEFT equi-joins.
    */
  def orderItems(stgOrderItems: DataFrame, stgOrders: DataFrame,
                 stgProducts: DataFrame, stgSupplies: DataFrame): DataFrame = {
    // A2: supply-cost rollup — sums ALL cost rows per key (grain trap,
    // SURVEY §7.4.8; unit test `order_items.yml:37-41` in the reference).
    val supplyCosts = stgSupplies
      .groupBy(col("supply_id").as("supplier_id"))
      .agg(dec18(sum(col("supply_cost"))).as("supply_cost"))

    // No forced broadcast on products/supply-costs: both scale with SF
    // (part ~billions of rows at 100 TB) — let AQE pick broadcast vs
    // shuffle from runtime sizes (VERDICT r1 #2). Forced broadcast is
    // reserved for genuinely bounded dims (nation=25/region=5 in
    // Staging.stgLocations).
    stgOrderItems
      .join(stgOrders.select("order_id", "ordered_at"), Seq("order_id"), "left")
      .join(stgProducts.select("product_id", "product_name",
        "product_type", "product_price", "is_promo_item", "is_economy_item"),
        Seq("product_id"), "left")
      .join(supplyCosts, Seq("supplier_id"), "left")
      .select(
        col("order_item_id"), col("order_id"), col("product_id"),
        col("supplier_id"), col("ordered_at"),
        col("product_name"), col("product_type"),
        col("is_promo_item"), col("is_economy_item"),
        col("product_price"), col("quantity"),
        col("extended_price"), col("discounted_price"),
        col("is_returned"), col("return_flag"), col("line_status"),
        col("shipped_at"),
        dec18(coalesce(col("supply_cost"), lit(0))).as("supply_cost"),
        dec184(col("discounted_price") - coalesce(col("supply_cost"), lit(0)))
          .as("gross_margin"))
  }

  /** orders mart (reference `models/marts/orders.sql`): A1 per-order item
    * rollup with conditional counts, J1 left join back, F6 coalesce
    * backfill, F7 boolean derivations, W1 customer order sequence.
    */
  def orders(stgOrders: DataFrame, orderItems: DataFrame): DataFrame = {
    val itemSummary = orderItems
      .groupBy("order_id")
      .agg(
        count(col("order_item_id")).as("count_order_items"),
        // sum(product_price), not discounted_price — reference
        // `orders.sql:21` (ADVICE r1).
        dec18(sum(col("product_price"))).as("order_items_subtotal"),
        dec18(sum(col("supply_cost"))).as("order_cost"),
        count(when(col("is_promo_item"), lit(1))).as("count_promo_items"),
        count(when(col("is_returned"), lit(1))).as("count_returned_items"))

    // W1: deterministic window — unique order_id tiebreak after ordered_at.
    val w = Window.partitionBy("customer_id").orderBy(col("ordered_at"), col("order_id"))

    stgOrders
      .join(itemSummary, Seq("order_id"), "left")
      .select(
        col("order_id"), col("customer_id"), col("ordered_at"),
        // reference orders carry the store (`stg_orders` store_id →
        // location_id); TPC-H orders have none, so assign a
        // deterministic location in [0,25) keyed by order_id —
        // matching stg_locations' nation keys. Computed, not joined:
        // free at any scale.
        (col("order_id") % 25).cast("int").as("location_id"),
        col("order_total"), col("subtotal"), col("tax_paid"),
        col("order_status"), col("order_priority"),
        coalesce(col("count_order_items"), lit(0L)).as("count_order_items"),
        dec18(coalesce(col("order_items_subtotal"), lit(0))).as("order_items_subtotal"),
        dec18(coalesce(col("order_cost"), lit(0))).as("order_cost"),
        coalesce(col("count_promo_items"), lit(0L)).as("count_promo_items"),
        coalesce(col("count_returned_items"), lit(0L)).as("count_returned_items"),
        (coalesce(col("count_promo_items"), lit(0L)) > 0).as("is_promo_order"),
        (coalesce(col("count_returned_items"), lit(0L)) > 0).as("has_returned_item"),
        row_number().over(w).as("customer_order_number"))
  }

  /** customers mart (reference `models/marts/customers.sql`): A3 lifetime
    * aggregates (count distinct, min/max, sums), J5 ⟕ back to dim, F7
    * customer_type tiering.
    */
  def customers(stgCustomers: DataFrame, orders: DataFrame): DataFrame = {
    val orderSummary = orders
      .groupBy("customer_id")
      .agg(
        countDistinct(col("order_id")).as("count_lifetime_orders"),
        min(col("ordered_at")).as("first_ordered_at"),
        max(col("ordered_at")).as("last_ordered_at"),
        dec18(sum(col("subtotal"))).as("lifetime_spend_pretax"),
        dec18(sum(col("tax_paid"))).as("lifetime_tax_paid"),
        dec18(sum(col("order_total"))).as("lifetime_spend"),
        dec18(sum(col("order_cost"))).as("lifetime_cost"))

    stgCustomers
      .join(orderSummary, Seq("customer_id"), "left")
      .select(
        col("customer_id"), col("customer_name"), col("location_id"),
        col("account_balance"), col("market_segment"),
        coalesce(col("count_lifetime_orders"), lit(0L)).as("count_lifetime_orders"),
        col("first_ordered_at"), col("last_ordered_at"),
        dec18(coalesce(col("lifetime_spend_pretax"), lit(0))).as("lifetime_spend_pretax"),
        dec18(coalesce(col("lifetime_tax_paid"), lit(0))).as("lifetime_tax_paid"),
        dec18(coalesce(col("lifetime_spend"), lit(0))).as("lifetime_spend"),
        dec18(coalesce(col("lifetime_cost"), lit(0))).as("lifetime_cost"),
        // zero-order customers are 'new', matching the reference's
        // `case when is_repeat_buyer then returning else new end`
        // (`customers.sql:47-50`; accepted_values {new, returning},
        // `customers.yml:31-33`) — ADVICE r1.
        when(coalesce(col("count_lifetime_orders"), lit(0L)) > 1, lit("returning"))
          .otherwise(lit("new")).as("customer_type"))
  }
}
