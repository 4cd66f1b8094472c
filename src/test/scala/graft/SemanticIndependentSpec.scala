package graft

import org.apache.spark.sql.DataFrame
import graft.semantic.{OracleGen, Registry}

/** Independent check on the GENERATED semantic oracles (VERDICT r10
  * #6): engine and DuckDB oracle both compile from the same spec
  * (`semantic/OracleGen.scala`), so a shared planner/generator bug
  * would pass the driver gate silently. Here three saved queries are
  * re-derived as HAND-WRITTEN SQL straight from the reference's YAML
  * semantics (orders.yml:99-143, order_items.yml:88-167) and asserted
  * equal to BOTH:
  *
  *  - the Planner's DataFrame output (catches engine-side bugs), and
  *  - the OracleGen-rendered SQL executed by Spark over the same marts
  *    (the generated dialect is the shared ANSI subset, so Spark can
  *    run it verbatim — catches generator-side bugs without DuckDB).
  *
  * A final test injects the off-by-one-month bug into the generated
  * SQL text and asserts the comparison CATCHES it — proving the check
  * has teeth, not just that three right answers agree. */
class SemanticIndependentSpec extends SparkSpec {

  private lazy val views: Unit = {
    Models.orders(spark, sf).createOrReplaceTempView("orders_mart")
    Models.orderItems(spark, sf).createOrReplaceTempView("order_items")
  }

  private def generatedSql(name: String): String =
    OracleGen.savedQuery(Registry.savedQuery(name), Registry, "")

  private def assertSame(a: DataFrame, b: DataFrame, label: String): Unit = {
    assert(a.columns.toSeq == b.columns.toSeq,
      s"$label: columns ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val extra = a.exceptAll(b).count()
    val missing = b.exceptAll(a).count()
    assert(extra == 0 && missing == 0,
      s"$label diverged: $extra extra rows, $missing missing rows")
  }

  // orders.yml:99-143 re-derived by hand: daily counts are filtered
  // SUM(CASE)s (NULL for no-match days — MetricFlow's outer-join
  // shape), order_total a summed money double.
  private val orderMetricsHand =
    """select cast(date_trunc('day', ordered_at) as date) as metric_time,
      |  cast(sum(1) as bigint) as orders,
      |  cast(sum(case when customer_order_number = 1 then 1 end) as bigint) as new_customer_orders,
      |  cast(sum(order_total) as double) as order_total,
      |  cast(sum(case when is_promo_order = true then 1 end) as bigint) as promo_orders,
      |  cast(sum(case when has_returned_item = true then 1 end) as bigint) as returned_orders
      |from orders_mart
      |group by 1""".stripMargin

  // order_items.yml derived revenue_growth_mom: monthly revenue joined
  // to itself shifted one month forward.
  private val growthMomHand =
    """with b as (
      |  select cast(date_trunc('month', ordered_at) as date) as metric_time,
      |    cast(sum(product_price) as double) as revenue
      |  from order_items group by 1
      |)
      |select b.metric_time,
      |  (b.revenue - p.revenue) * 100 / p.revenue as revenue_growth_mom
      |from b left join b p on b.metric_time = add_months(p.metric_time, 1)""".stripMargin

  // order_items.yml cumulative revenue at month × product grain: exact
  // decimal running window per product, double only at presentation.
  private val cumulativeByProductHand =
    """with b as (
      |  select cast(date_trunc('month', ordered_at) as date) as metric_time,
      |    product_id as product,
      |    sum(product_price) as rev
      |  from order_items group by 1, 2
      |)
      |select metric_time, product,
      |  cast(sum(rev) over (partition by product order by metric_time
      |       rows between unbounded preceding and current row) as double) as cumulative_revenue
      |from b""".stripMargin

  private val cases = Seq(
    ("order_metrics", () => orderMetricsHand),
    ("metric_revenue_growth_mom", () => growthMomHand),
    ("metric_cumulative_revenue_by_product", () => cumulativeByProductHand))

  for ((name, hand) <- cases) {
    test(s"$name: planner output equals the hand-written reference SQL") {
      views
      assertSame(SparkEntry.queries(name)(spark, sf), spark.sql(hand()), s"planner:$name")
    }
    test(s"$name: OracleGen's rendered SQL equals the hand-written reference SQL") {
      views
      assertSame(spark.sql(generatedSql(name)), spark.sql(hand()), s"oraclegen:$name")
    }
  }

  test("the check has teeth: an injected off-by-one-month offset is caught") {
    views
    val sql = generatedSql("metric_revenue_growth_mom")
    assert(sql.contains("interval 1 month"), "expected the offset CTE in the generated SQL")
    val buggy = sql.replace("interval 1 month", "interval 2 month")
    val diff = spark.sql(buggy).exceptAll(spark.sql(growthMomHand)).count()
    assert(diff > 0, "a 2-month offset should diverge from the hand-written MoM growth")
  }
}
