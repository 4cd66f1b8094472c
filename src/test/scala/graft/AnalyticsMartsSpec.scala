package graft

import org.apache.spark.sql.functions._
import graft.testing.DataTests._

/** Data tests for the analytics/time/segmentation marts, mirroring the
  * reference's declared tests (products.yml, locations.yml, supplies.yml,
  * time_analytics.yml, customer_segmentation.yml primary keys) via the
  * generic DataTests library (SURVEY §5.1).
  */
class AnalyticsMartsSpec extends SparkSpec {

  test("products: unique + not_null primary key") {
    val p = Models.products(spark, sf)
    assert(notNull(p, "product_id") === 0)
    assert(unique(p, "product_id") === 0)
  }

  test("products: ranks are a permutation of 1..N") {
    val p = Models.products(spark, sf)
    val n = p.count()
    assert(p.agg(countDistinct(col("revenue_rank"))).head.getLong(0) === n)
    assert(p.agg(max(col("revenue_rank"))).head.getInt(0) === n)
  }

  test("locations: unique PK + retention rate within [0,1]") {
    val l = Models.locations(spark, sf)
    assert(notNull(l, "location_id") === 0)
    assert(unique(l, "location_id") === 0)
    assert(expressionIsTrue(l,
      col("customer_retention_rate").between(0.0, 1.0)) === 0)
  }

  test("supplies: unique supply_uuid; two components per supplier") {
    val s = Models.supplies(spark, sf)
    assert(unique(s, "supply_uuid") === 0)
    val perSupplier = s.groupBy("supply_id").count()
    assert(perSupplier.filter(col("count") =!= 2).count() === 0)
  }

  test("supplies: N:M fan-out preserved — supply cost rollup sums all component rows") {
    // grain trap (reference unit test order_items.yml:37-41): each
    // order_item's supply_cost must equal the SUM of both component
    // rows of its supplier, which reconstructs the supplier base cost.
    val stg = Models.stgSupplies(spark, sf)
    val base = stg.groupBy(col("supply_id").as("supplier_id"))
      .agg(sum(col("supply_cost")).cast("double").as("expected"))
    val oi = Models.orderItems(spark, sf)
      .select(col("supplier_id"), col("supply_cost").cast("double").as("actual"))
    val bad = oi.join(base, Seq("supplier_id"), "left")
      .filter(col("actual") =!= col("expected")).count()
    assert(bad === 0)
  }

  test("time_analytics: unique date_day, calendar gap days preserved with zero backfill") {
    val t = Models.timeAnalytics(spark, sf)
    assert(unique(t, "date_day") === 0)
    // spine preserves days with no orders as zero rows (J17 left join)
    assert(t.filter(col("daily_orders") === 0).count() > 0)
    assert(notNull(t, "daily_revenue") === 0)
  }

  test("cohort_retention: customers sums to distinct customers per month") {
    val orders = Models.orders(spark, sf)
    val byMonth = orders.groupBy(date_trunc("month", col("ordered_at")).as("m"))
      .agg(countDistinct("customer_id").as("expected"))
    val cr = Models.cohortRetention(spark, sf)
      .groupBy(col("cohort_month").as("m")).agg(sum("customers").as("actual"))
    val bad = byMonth.join(cr, byMonth("m") === cr("m").cast("timestamp"))
      .filter(col("expected") =!= col("actual")).count()
    assert(bad === 0)
  }

  test("customer_segmentation: unique PK + accepted segment values") {
    val cs = Models.customerSegmentation(spark, sf)
    assert(notNull(cs, "customer_id") === 0)
    assert(unique(cs, "customer_id") === 0)
    assert(acceptedValues(cs, "rfm_segment", Seq(
      "Champions", "Loyal Customers", "Potential Loyalists", "New Customers",
      "Promising", "Need Attention", "About to Sleep", "At Risk",
      "Cannot Lose Them", "Hibernating", "Lost")) === 0)
    assert(expressionIsTrue(cs,
      col("recency_score").between(1, 5) &&
        col("frequency_quintile").between(1, 5) &&
        col("monetary_quintile").between(1, 5)) === 0)
  }

  test("growth_metrics: lag links consecutive months") {
    val g = Models.growthMetrics(spark, sf).orderBy("order_month").collect()
    g.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur.getAs[Double]("prev_month_revenue") === prev.getAs[Double]("monthly_revenue"))
    }
  }

  test("relationships: order_items.supplier_id -> stg_supplies.supply_id") {
    assert(relationships(
      Models.orderItems(spark, sf), "supplier_id",
      Models.stgSupplies(spark, sf), "supply_id") === 0)
  }
}
