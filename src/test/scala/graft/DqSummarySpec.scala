package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.testing.DqSummary

/** The dq_summary audit query: rule arity, per-rule failure detection
  * on doctored inputs, and the all-green invariant on the real models
  * (the driver's differential gate re-verifies the latter against
  * DuckDB). */
class DqSummarySpec extends SparkSpec {
  import spark.implicits._

  private def key(name: String, ids: Seq[Option[Long]]): DataFrame =
    ids.toDF(name)

  /** Minimal doctored tables: one violation per rule family. */
  private def doctored(name: String): DataFrame = name match {
    case "stg_customers" =>
      // null key + duplicated key 2
      key("customer_id", Seq(Some(1L), None, Some(2L), Some(2L)))
    case "stg_orders" =>
      Seq(
        (1L, Timestamp.valueOf("2001-08-01 00:00:00"), BigDecimal("10.00"), BigDecimal("1.00"), BigDecimal("9.00")),
        // violates order_total - tax_paid = subtotal
        (2L, Timestamp.valueOf("2001-01-01 00:00:00"), BigDecimal("10.00"), BigDecimal("1.00"), BigDecimal("8.00")))
        .toDF("order_id", "ordered_at", "order_total", "tax_paid", "subtotal")
    case "orders" =>
      Seq((1L, 1L, BigDecimal("10.00"), BigDecimal("9.00"), BigDecimal("1.00")),
        // orphan customer 99; total ≠ subtotal + tax
        (2L, 99L, BigDecimal("10.00"), BigDecimal("8.00"), BigDecimal("1.00")))
        .toDF("order_id", "customer_id", "order_total", "subtotal", "tax_paid")
    case "customers" =>
      Seq((1L, "new", BigDecimal("9.00"), BigDecimal("1.00"), BigDecimal("10.00")),
        // bad type; pretax + tax ≠ spend
        (2L, "weird", BigDecimal("9.00"), BigDecimal("1.00"), BigDecimal("11.00")))
        .toDF("customer_id", "customer_type",
          "lifetime_spend_pretax", "lifetime_tax_paid", "lifetime_spend")
    case "order_items" => Seq((1L, 1L), (2L, 1L))
      .toDF("order_item_id", "order_id")
    case "stg_order_items" => Seq((1L, 1L), (2L, 7L)) // orphan order 7
      .toDF("order_item_id", "order_id")
    case "stg_products" => key("product_id", Seq(Some(1L)))
    case "stg_locations" => key("location_id", Seq(Some(1L)))
    case "stg_supplies" => Seq("s1").toDF("supply_uuid")
    case "products" => key("product_id", Seq(Some(1L)))
    case "locations" => key("location_id", Seq(Some(1L)))
    case "supplies" => Seq("s1").toDF("supply_uuid")
    case "customer_segmentation" => key("customer_id", Seq(Some(1L)))
    case "time_analytics" => Seq(Date.valueOf("2001-08-01")).toDF("date_day")
    case other => sys.error(other)
  }

  private lazy val audit = DqSummary.summary(doctored)
    .collect()
    .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
    .toMap

  test("one row per declared rule instance") {
    val expected = DqSummary.primaryKeys.size * 2 +
      DqSummary.relationshipRules.size + DqSummary.acceptedValueRules.size +
      DqSummary.expressionRules.size + DqSummary.freshnessRules.size
    assert(audit.size === expected)
    assert(expected === 36)
  }

  test("not_null and unique count key violations") {
    assert(audit(("not_null", "stg_customers", "customer_id")) === 1L)
    assert(audit(("unique", "stg_customers", "customer_id")) === 1L)
    assert(audit(("not_null", "orders", "order_id")) === 0L)
    assert(audit(("unique", "orders", "order_id")) === 0L)
  }

  test("relationships count orphan child rows") {
    assert(audit(("relationships", "orders", "customer_id -> stg_customers.customer_id")) === 1L)
    assert(audit(("relationships", "stg_order_items", "order_id -> stg_orders.order_id")) === 1L)
    assert(audit(("relationships", "order_items", "order_id -> orders.order_id")) === 0L)
  }

  test("accepted_values, expression_is_true, freshness fire on violations") {
    assert(audit(("accepted_values", "customers", "customer_type")) === 1L)
    assert(audit(("expression_is_true", "stg_orders", "order_total - tax_paid = subtotal")) === 1L)
    assert(audit(("expression_is_true", "orders", "order_total = subtotal + tax_paid")) === 1L)
    assert(audit(("expression_is_true", "customers",
      "lifetime_spend_pretax + lifetime_tax_paid = lifetime_spend")) === 1L)
    // max(ordered_at) 2001-08-01 is within 30 days of the pinned clock
    assert(audit(("freshness", "stg_orders", "ordered_at")) === 0L)
  }

  test("freshness fails when the newest load is stale") {
    val stale = DqSummary.summary {
      case "stg_orders" =>
        Seq((1L, Timestamp.valueOf("2001-01-01 00:00:00"), BigDecimal("10.00"),
          BigDecimal("1.00"), BigDecimal("9.00")))
          .toDF("order_id", "ordered_at", "order_total", "tax_paid", "subtotal")
      case other => doctored(other)
    }
    val f = stale.filter(col("rule") === "freshness").select("n_failing").as[Long].head()
    assert(f === 1L)
  }

  test("the real models audit green (36 × n_failing = 0)") {
    val real = Models.dqSummary(spark, sf)
    assert(real.count() === 36L)
    assert(real.filter(col("n_failing") =!= 0L).count() === 0L)
  }
}
