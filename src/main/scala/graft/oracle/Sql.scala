package graft.oracle

/** DuckDB oracle SQL mirroring each model exactly (driver contract:
  * Verify dumps these to oracle_sql.json; driver hash-compares).
  *
  * Determinism rules shared with the Scala side (see Funcs scaladoc):
  * decimal money, count(case...) instead of sum(case...) (DuckDB sums
  * ints to HUGEINT), single-division doubles, tiebroken windows.
  */
object Sql {

  val runDate = "DATE '2001-08-15'"

  /** Double literal that DuckDB parses as DOUBLE, not DECIMAL: a bare
    * `0.1249…` literal becomes DECIMAL(18,17) and its decimal→double
    * conversion can land one ULP off the Spark-side `lit` (caught
    * live by the benford_digits gate, r14). Exponent notation pins
    * the parser to float64, so the shortest-round-trip digits recover
    * the identical bits. */
  def dlit(v: Double): String = {
    val s = v.toString
    if (s.contains("E") || s.contains("e")) s else s + "e0"
  }

  // ---- staging CTE bodies (mirror graft.staging.Staging) ----

  val stgCustomers: String =
    """select c_custkey as customer_id, c_name as customer_name,
      |  c_nationkey as location_id,
      |  cast(c_acctbal as decimal(18,2)) as account_balance,
      |  c_mktsegment as market_segment
      |from customer""".stripMargin

  val stgOrders: String =
    """select o_orderkey as order_id, o_custkey as customer_id,
      |  cast(o_orderdate as date) as ordered_at,
      |  cast(o_totalprice as decimal(18,2)) as order_total,
      |  cast(cast(o_totalprice as decimal(18,2))
      |       - cast(o_totalprice * 0.04 as decimal(18,2)) as decimal(18,2)) as subtotal,
      |  cast(o_totalprice * 0.04 as decimal(18,2)) as tax_paid,
      |  o_orderstatus as order_status, o_orderpriority as order_priority
      |from orders""".stripMargin

  val stgOrderItems: String =
    """select
      |  md5(concat_ws('-',
      |    coalesce(cast(l_orderkey as varchar), '_dbt_utils_surrogate_key_null_'),
      |    coalesce(cast(l_linenumber as varchar), '_dbt_utils_surrogate_key_null_'),
      |    coalesce(cast(l_partkey as varchar), '_dbt_utils_surrogate_key_null_'),
      |    coalesce(cast(l_suppkey as varchar), '_dbt_utils_surrogate_key_null_'),
      |    coalesce(cast(cast(l_shipdate as date) as varchar), '_dbt_utils_surrogate_key_null_'))) as order_item_id,
      |  l_orderkey as order_id, l_linenumber as line_number,
      |  l_partkey as product_id, l_suppkey as supplier_id,
      |  cast(l_quantity as decimal(12,2)) as quantity,
      |  cast(l_extendedprice as decimal(18,2)) as extended_price,
      |  cast(cast(l_extendedprice as decimal(18,2))
      |       * (1 - cast(l_discount as decimal(3,2))) as decimal(18,4)) as discounted_price,
      |  l_discount as discount_rate, l_tax as tax_rate,
      |  l_returnflag = 'R' as is_returned,
      |  l_returnflag as return_flag, l_linestatus as line_status,
      |  cast(l_shipdate as date) as shipped_at
      |from lineitem""".stripMargin

  val stgProducts: String =
    """select p_partkey as product_id, p_name as product_name,
      |  p_type as product_type, p_brand as brand, p_size as product_size,
      |  cast(p_retailprice as decimal(18,2)) as product_price,
      |  coalesce(p_type like 'PROMO%', false) as is_promo_item,
      |  coalesce(p_type like 'ECONOMY%', false) as is_economy_item
      |from part""".stripMargin

  val stgLocations: String =
    """select n_nationkey as location_id, n_name as location_name,
      |  r_name as region_name,
      |  cast(n_nationkey % 5 as double) / 100.0 + 0.04 as tax_rate,
      |  cast(DATE '1995-01-01' + (n_nationkey * 30) as date) as opened_at
      |from nation left join region on n_regionkey = r_regionkey""".stripMargin

  /* Two cost-component rows per supplier (mirrors graft Staging: exact
   * 0.75/0.25 decimal fractions at scale 4 — no rounding step). */
  val stgSupplies: String =
    """select
      |  md5(concat_ws('-',
      |    coalesce(cast(s_suppkey as varchar), '_dbt_utils_surrogate_key_null_'),
      |    'materials')) as supply_uuid,
      |  s_suppkey as supply_id, s_name as supply_name,
      |  'materials' as supply_component,
      |  s_nationkey as location_id,
      |  cast(cast(abs(s_acctbal) as decimal(18,2)) * 0.75 as decimal(18,4)) as supply_cost,
      |  (s_suppkey + 0) % 2 = 1 as is_perishable_supply
      |from supplier
      |union all
      |select
      |  md5(concat_ws('-',
      |    coalesce(cast(s_suppkey as varchar), '_dbt_utils_surrogate_key_null_'),
      |    'freight')) as supply_uuid,
      |  s_suppkey as supply_id, s_name as supply_name,
      |  'freight' as supply_component,
      |  s_nationkey as location_id,
      |  cast(cast(abs(s_acctbal) as decimal(18,2)) * 0.25 as decimal(18,4)) as supply_cost,
      |  (s_suppkey + 1) % 2 = 1 as is_perishable_supply
      |from supplier""".stripMargin

  /** All staging models as a WITH prefix for mart oracles. */
  val stagingCtes: String =
    s"""with stg_customers as ($stgCustomers),
       |stg_orders as ($stgOrders),
       |stg_order_items as ($stgOrderItems),
       |stg_products as ($stgProducts),
       |stg_locations as ($stgLocations),
       |stg_supplies as ($stgSupplies)""".stripMargin

  // ---- mart CTE bodies (composable: marts read other marts) ----

  val orderItemsBody: String =
    """select oi.order_item_id, oi.order_id, oi.product_id, oi.supplier_id,
      |  o.ordered_at, p.product_name, p.product_type,
      |  p.is_promo_item, p.is_economy_item, p.product_price,
      |  oi.quantity, oi.extended_price, oi.discounted_price,
      |  oi.is_returned, oi.return_flag, oi.line_status, oi.shipped_at,
      |  cast(coalesce(sc.supply_cost, 0) as decimal(18,2)) as supply_cost,
      |  cast(oi.discounted_price - coalesce(sc.supply_cost, 0) as decimal(18,4)) as gross_margin
      |from stg_order_items oi
      |left join (select order_id, ordered_at from stg_orders) o using (order_id)
      |left join stg_products p using (product_id)
      |left join (
      |  select supply_id as supplier_id,
      |    cast(sum(supply_cost) as decimal(18,2)) as supply_cost
      |  from stg_supplies group by 1
      |) sc using (supplier_id)""".stripMargin

  val ordersBody: String =
    """select o.order_id, o.customer_id, o.ordered_at,
      |  cast(o.order_id % 25 as int) as location_id,
      |  o.order_total, o.subtotal, o.tax_paid, o.order_status, o.order_priority,
      |  coalesce(s.count_order_items, 0) as count_order_items,
      |  cast(coalesce(s.order_items_subtotal, 0) as decimal(18,2)) as order_items_subtotal,
      |  cast(coalesce(s.order_cost, 0) as decimal(18,2)) as order_cost,
      |  coalesce(s.count_promo_items, 0) as count_promo_items,
      |  coalesce(s.count_returned_items, 0) as count_returned_items,
      |  coalesce(s.count_promo_items, 0) > 0 as is_promo_order,
      |  coalesce(s.count_returned_items, 0) > 0 as has_returned_item,
      |  row_number() over (partition by o.customer_id
      |                     order by o.ordered_at, o.order_id) as customer_order_number
      |from stg_orders o
      |left join (
      |  select order_id,
      |    count(order_item_id) as count_order_items,
      |    cast(sum(product_price) as decimal(18,2)) as order_items_subtotal,
      |    cast(sum(supply_cost) as decimal(18,2)) as order_cost,
      |    count(case when is_promo_item then 1 end) as count_promo_items,
      |    count(case when is_returned then 1 end) as count_returned_items
      |  from order_items group by 1
      |) s using (order_id)""".stripMargin

  /** customers mart body over pluggable dim/fact relations — the CDC
    * oracle diffs two snapshot variants of the same body. */
  def customersBodyFrom(custRel: String, ordersRel: String): String =
    s"""select c.customer_id, c.customer_name, c.location_id,
      |  c.account_balance, c.market_segment,
      |  coalesce(s.count_lifetime_orders, 0) as count_lifetime_orders,
      |  s.first_ordered_at, s.last_ordered_at,
      |  cast(coalesce(s.lifetime_spend_pretax, 0) as decimal(18,2)) as lifetime_spend_pretax,
      |  cast(coalesce(s.lifetime_tax_paid, 0) as decimal(18,2)) as lifetime_tax_paid,
      |  cast(coalesce(s.lifetime_spend, 0) as decimal(18,2)) as lifetime_spend,
      |  cast(coalesce(s.lifetime_cost, 0) as decimal(18,2)) as lifetime_cost,
      |  case when coalesce(s.count_lifetime_orders, 0) > 1 then 'returning'
      |       else 'new' end as customer_type
      |from $custRel c
      |left join (
      |  select customer_id,
      |    count(distinct order_id) as count_lifetime_orders,
      |    min(ordered_at) as first_ordered_at,
      |    max(ordered_at) as last_ordered_at,
      |    cast(sum(subtotal) as decimal(18,2)) as lifetime_spend_pretax,
      |    cast(sum(tax_paid) as decimal(18,2)) as lifetime_tax_paid,
      |    cast(sum(order_total) as decimal(18,2)) as lifetime_spend,
      |    cast(sum(order_cost) as decimal(18,2)) as lifetime_cost
      |  from $ordersRel group by 1
      |) s using (customer_id)""".stripMargin

  val customersBody: String = customersBodyFrom("stg_customers", "orders_mart")

  /** Mart-level WITH prefix: staging + the three core marts. */
  val coreCtes: String =
    s"""$stagingCtes,
       |order_items as ($orderItemsBody),
       |orders_mart as ($ordersBody),
       |customers_mart as ($customersBody)""".stripMargin

  // ---- analytics marts (mirror graft.marts.AnalyticsMarts) ----
  // Every ratio/average is written as the SAME single double expression
  // the Scala side emits (sum::double / count::double etc.) so both
  // engines produce bit-identical float64.

  val productsCtes: String =
    """product_perf as (
      |  select p.product_id, p.product_name, p.product_type, p.brand,
      |    p.product_price, p.is_promo_item, p.is_economy_item,
      |    count(distinct oi.order_id) as total_orders,
      |    count(oi.order_item_id) as total_quantity_sold,
      |    cast(sum(oi.product_price) as decimal(18,2)) as rev_d,
      |    cast(sum(oi.supply_cost) as decimal(18,2)) as cost_d
      |  from stg_products p
      |  left join order_items oi using (product_id)
      |  group by 1,2,3,4,5,6,7
      |),
      |product_perf2 as (
      |  select product_id, product_name, product_type, brand, product_price,
      |    is_promo_item, is_economy_item, total_orders, total_quantity_sold,
      |    cast(rev_d as double) as total_revenue,
      |    cast(cost_d as double) as total_supply_cost,
      |    cast(rev_d - cost_d as double) as total_profit,
      |    case when cost_d > 0 then cast(rev_d - cost_d as double) / cast(cost_d as double) end as profit_margin_ratio,
      |    case when total_quantity_sold > 0 then cast(rev_d as double) / cast(total_quantity_sold as double) end as avg_selling_price,
      |    case when total_quantity_sold > 0 then cast(cost_d as double) / cast(total_quantity_sold as double) end as avg_supply_cost
      |  from product_perf
      |),
      |product_ranked as (
      |  select *,
      |    row_number() over (order by total_revenue desc nulls last, product_id) as revenue_rank,
      |    row_number() over (order by total_quantity_sold desc nulls last, product_id) as popularity_rank,
      |    row_number() over (order by total_profit desc nulls last, product_id) as profit_rank,
      |    row_number() over (order by profit_margin_ratio desc nulls last, product_id) as margin_rank
      |  from product_perf2
      |),
      |product_seasonal as (
      |  select oi.product_id,
      |    extract(quarter from oi.ordered_at) as order_quarter,
      |    extract(month from oi.ordered_at) as order_month,
      |    count(oi.order_item_id) as quarterly_quantity,
      |    cast(sum(oi.product_price) as decimal(18,2)) as quarterly_revenue
      |  from order_items oi group by 1,2,3
      |),
      |product_seasonal_summary as (
      |  select product_id,
      |    cast(max(quarterly_revenue) as double) as peak_quarter_revenue,
      |    cast(min(quarterly_revenue) as double) as low_quarter_revenue,
      |    case when count(quarterly_revenue) > 0 then cast(sum(quarterly_revenue) as double) / cast(count(quarterly_revenue) as double) end as avg_quarterly_revenue,
      |    case when max(quarterly_revenue) > 0 then cast(max(quarterly_revenue) - min(quarterly_revenue) as double) / cast(max(quarterly_revenue) as double) else 0.0 end as seasonality_index
      |  from product_seasonal group by 1
      |),
      |product_loc as (
      |  select oi.product_id, o.location_id,
      |    count(oi.order_item_id) as location_quantity,
      |    cast(sum(oi.product_price) as decimal(18,2)) as location_revenue
      |  from order_items oi
      |  left join (select order_id, location_id from orders_mart) o using (order_id)
      |  group by 1,2
      |),
      |product_loc_summary as (
      |  select product_id,
      |    count(distinct location_id) as locations_sold_at,
      |    cast(max(location_revenue) as double) as best_location_revenue,
      |    cast(min(location_revenue) as double) as worst_location_revenue
      |  from product_loc group by 1
      |),
      |products_mart as (
      |  select r.product_id, r.product_name, r.product_type, r.brand, r.product_price,
      |    r.is_promo_item, r.is_economy_item,
      |    r.total_orders, r.total_quantity_sold, r.total_revenue, r.total_supply_cost,
      |    r.total_profit, r.profit_margin_ratio, r.avg_selling_price, r.avg_supply_cost,
      |    r.revenue_rank, r.popularity_rank, r.profit_rank, r.margin_rank,
      |    coalesce(l.locations_sold_at, 0) as locations_sold_at,
      |    coalesce(l.best_location_revenue, 0) as best_location_revenue,
      |    coalesce(l.worst_location_revenue, 0) as worst_location_revenue,
      |    coalesce(s.peak_quarter_revenue, 0) as peak_quarter_revenue,
      |    coalesce(s.low_quarter_revenue, 0) as low_quarter_revenue,
      |    coalesce(s.avg_quarterly_revenue, 0) as avg_quarterly_revenue,
      |    coalesce(s.seasonality_index, 0) as seasonality_index,
      |    case when r.revenue_rank <= 5 then 'Top Performer'
      |         when r.revenue_rank <= 10 then 'High Performer'
      |         when r.revenue_rank <= 20 then 'Medium Performer'
      |         else 'Low Performer' end as performance_tier
      |  from product_ranked r
      |  left join product_loc_summary l using (product_id)
      |  left join product_seasonal_summary s using (product_id)
      |)""".stripMargin

  // string-routed decimal→double matches Spark's correctly-rounded
  // conversion for sums whose unscaled value exceeds 2^53 (see
  // Funcs.stddevFromSums).
  private val locSxStr = "cast(cast(sum(order_total - order_cost) as varchar) as double)"
  private val locSx2Str = "cast(cast(sum((order_total - order_cost) * (order_total - order_cost)) as varchar) as double)"
  private val locSx = "cast(sum(order_total - order_cost) as double)"
  private val locN = "cast(count(order_id) as double)"
  private val locStd = s"sqrt(($locSx2Str - $locSxStr * $locSxStr / $locN) / ($locN - 1.0))"
  private val locAvg = s"case when count(order_id) > 0 then $locSx / $locN end"

  val locationsCtes: String =
    s"""loc_perf as (
      |  select l.location_id, l.location_name, l.tax_rate, l.opened_at,
      |    count(distinct o.order_id) as total_orders,
      |    count(distinct o.customer_id) as unique_customers,
      |    cast(sum(o.order_total) as decimal(18,2)) as rev_d,
      |    cast(sum(o.tax_paid) as decimal(18,2)) as tax_d,
      |    cast(sum(o.order_cost) as decimal(18,2)) as cost_d,
      |    count(o.order_id) as n_orders,
      |    count(case when o.is_promo_order then 1 end) as promo_orders,
      |    count(case when o.has_returned_item then 1 end) as returned_orders,
      |    count(distinct case when o.customer_order_number = 1 then o.customer_id end) as new_customers,
      |    count(distinct case when o.customer_order_number > 1 then o.customer_id end) as returning_customers
      |  from stg_locations l
      |  left join orders_mart o using (location_id)
      |  group by 1,2,3,4
      |),
      |loc_perf2 as (
      |  select location_id, location_name, tax_rate, opened_at, total_orders, unique_customers,
      |    cast(rev_d as double) as total_revenue,
      |    cast(tax_d as double) as total_tax_collected,
      |    cast(cost_d as double) as total_supply_cost,
      |    cast(rev_d - cost_d as double) as total_profit,
      |    case when n_orders > 0 then cast(rev_d as double) / cast(n_orders as double) end as avg_order_value,
      |    case when n_orders > 0 then cast(cost_d as double) / cast(n_orders as double) end as avg_order_cost,
      |    case when cost_d > 0 then cast(rev_d - cost_d as double) / cast(cost_d as double) end as profit_margin_ratio,
      |    promo_orders, returned_orders, new_customers, returning_customers
      |  from loc_perf
      |),
      |loc_ranked as (
      |  select *,
      |    row_number() over (order by total_revenue desc nulls last, location_id) as revenue_rank,
      |    row_number() over (order by total_orders desc nulls last, location_id) as order_volume_rank,
      |    row_number() over (order by unique_customers desc nulls last, location_id) as customer_base_rank,
      |    row_number() over (order by avg_order_value desc nulls last, location_id) as aov_rank,
      |    row_number() over (order by profit_margin_ratio desc nulls last, location_id) as profitability_rank
      |  from loc_perf2
      |),
      |loc_behavior as (
      |  select o.location_id,
      |    case when count(c.count_lifetime_orders) > 0 then cast(sum(c.count_lifetime_orders) as double) / cast(count(c.count_lifetime_orders) as double) end as avg_customer_lifetime_orders,
      |    case when count(c.lifetime_spend) > 0 then cast(cast(sum(c.lifetime_spend) as decimal(18,2)) as double) / cast(count(c.lifetime_spend) as double) end as avg_customer_lifetime_value,
      |    count(distinct case when c.customer_type = 'new' then c.customer_id end) as new_customer_count,
      |    count(distinct case when c.customer_type = 'returning' then c.customer_id end) as returning_customer_count,
      |    case when count(distinct c.customer_id) > 0 then cast(count(distinct case when c.customer_type = 'returning' then c.customer_id end) as double) / cast(count(distinct c.customer_id) as double) else 0.0 end as customer_retention_rate
      |  from orders_mart o
      |  left join customers_mart c using (customer_id)
      |  group by 1
      |),
      |loc_supply as (
      |  select location_id,
      |    $locAvg as avg_profit_per_order,
      |    case when count(order_id) > 1 then $locStd end as profit_variance,
      |    case when ($locAvg) > 0 then (case when count(order_id) > 1 then $locStd end) / ($locAvg) end as profit_coefficient_of_variation
      |  from orders_mart group by 1
      |),
      |locations_mart as (
      |  select r.*,
      |    coalesce(b.avg_customer_lifetime_orders, 0) as avg_customer_lifetime_orders,
      |    coalesce(b.avg_customer_lifetime_value, 0) as avg_customer_lifetime_value,
      |    coalesce(b.customer_retention_rate, 0) as customer_retention_rate,
      |    coalesce(s.avg_profit_per_order, 0) as avg_profit_per_order,
      |    coalesce(s.profit_variance, 0) as profit_variance,
      |    coalesce(s.profit_coefficient_of_variation, 0) as profit_coefficient_of_variation,
      |    case when r.revenue_rank <= 2 then 'Top Performer'
      |         when r.revenue_rank <= 4 then 'High Performer'
      |         else 'Standard Performer' end as performance_tier,
      |    case when coalesce(b.customer_retention_rate, 0) >= 0.7 then 'High Retention'
      |         when coalesce(b.customer_retention_rate, 0) >= 0.5 then 'Medium Retention'
      |         else 'Low Retention' end as retention_tier
      |  from loc_ranked r
      |  left join loc_behavior b using (location_id)
      |  left join loc_supply s using (location_id)
      |)""".stripMargin

  val suppliesCtes: String =
    """supply_perf as (
      |  select s.supply_uuid, s.supply_id, s.supply_name, s.supply_component,
      |    s.supply_cost, s.is_perishable_supply,
      |    count(distinct oi.order_id) as orders_using_supply,
      |    count(oi.order_item_id) as total_usage_quantity,
      |    cast(sum(oi.product_price) as decimal(18,2)) as rev_d,
      |    cast(sum(oi.supply_cost) as decimal(18,2)) as cost_d
      |  from stg_supplies s
      |  left join order_items oi on s.supply_id = oi.supplier_id
      |  group by 1,2,3,4,5,6
      |),
      |supply_perf2 as (
      |  select supply_uuid, supply_id, supply_name, supply_component, supply_cost, is_perishable_supply,
      |    orders_using_supply, total_usage_quantity,
      |    cast(rev_d as double) as revenue_generated,
      |    cast(cost_d as double) as total_supply_cost_incurred,
      |    case when cost_d > 0 then cast(rev_d as double) / cast(cost_d as double) end as revenue_to_cost_ratio,
      |    case when total_usage_quantity > 0 then cast(rev_d as double) / cast(total_usage_quantity as double) end as avg_product_selling_price,
      |    case when total_usage_quantity > 0 then cast(cost_d as double) / cast(total_usage_quantity as double) else cast(supply_cost as double) end as avg_cost_per_usage
      |  from supply_perf
      |),
      |supply_ranked as (
      |  select *,
      |    row_number() over (order by total_usage_quantity desc nulls last, supply_uuid) as usage_rank,
      |    row_number() over (order by revenue_generated desc nulls last, supply_uuid) as revenue_contribution_rank,
      |    row_number() over (order by revenue_to_cost_ratio desc nulls last, supply_uuid) as efficiency_rank,
      |    row_number() over (order by total_supply_cost_incurred desc nulls last, supply_uuid) as cost_rank
      |  from supply_perf2
      |),
      |supply_turnover as (
      |  select supply_uuid,
      |    case when supply_cost > 0 and total_usage_quantity > 0 then total_supply_cost_incurred / cast(supply_cost as double) else 0.0 end as turnover_ratio,
      |    case when total_usage_quantity > 0 then cast(365.0 as double) / cast(total_usage_quantity as double) end as days_between_usage
      |  from supply_perf2
      |),
      |supply_variance as (
      |  select supply_uuid,
      |    case when supply_cost > 0 then (avg_cost_per_usage - cast(supply_cost as double)) / cast(supply_cost as double) else 0.0 end as cost_variance_percentage,
      |    abs(avg_cost_per_usage - cast(supply_cost as double)) as absolute_cost_variance
      |  from supply_perf2
      |),
      |supplies_mart as (
      |  select r.supply_uuid, r.supply_id, r.supply_name, r.supply_component,
      |    cast(r.supply_cost as double) as supply_cost, r.is_perishable_supply,
      |    r.orders_using_supply, r.total_usage_quantity, r.revenue_generated,
      |    r.total_supply_cost_incurred, r.revenue_to_cost_ratio,
      |    r.avg_product_selling_price, r.avg_cost_per_usage,
      |    r.usage_rank, r.revenue_contribution_rank, r.efficiency_rank, r.cost_rank,
      |    coalesce(t.turnover_ratio, 0) as inventory_turnover_ratio,
      |    coalesce(t.days_between_usage, 0) as avg_days_between_usage,
      |    coalesce(v.cost_variance_percentage, 0) as cost_variance_percentage,
      |    coalesce(v.absolute_cost_variance, 0) as absolute_cost_variance,
      |    case when r.usage_rank <= 5 then 'High Usage'
      |         when r.usage_rank <= 15 then 'Medium Usage'
      |         else 'Low Usage' end as usage_tier,
      |    case when r.efficiency_rank <= 5 then 'High Efficiency'
      |         when r.efficiency_rank <= 15 then 'Medium Efficiency'
      |         else 'Low Efficiency' end as efficiency_tier,
      |    case when r.is_perishable_supply and coalesce(t.days_between_usage, 0) > 7 then 'Risk: Slow Moving Perishable'
      |         when not r.is_perishable_supply and coalesce(t.days_between_usage, 0) > 30 then 'Risk: Slow Moving'
      |         when coalesce(v.cost_variance_percentage, 0) > 0.2 then 'Risk: High Cost Variance'
      |         else 'Normal' end as risk_category
      |  from supply_ranked r
      |  left join supply_turnover t using (supply_uuid)
      |  left join supply_variance v using (supply_uuid)
      |),
      |supplier_rollup as (
      |  select s.supply_name,
      |    count(distinct s.supply_component) as components_supplied,
      |    case when count(s.supply_cost) > 0 then cast(cast(sum(s.supply_cost) as decimal(18,4)) as double) / cast(count(s.supply_cost) as double) end as avg_supply_cost,
      |    cast(sum(p.total_usage_quantity) as bigint) as total_supplier_usage,
      |    sum(p.revenue_generated) as total_supplier_revenue,
      |    case when sum(p.total_supply_cost_incurred) > 0 then sum(p.revenue_generated) / sum(p.total_supply_cost_incurred) end as supplier_efficiency_ratio
      |  from stg_supplies s
      |  left join (select supply_uuid, total_usage_quantity, revenue_generated, total_supply_cost_incurred from supply_perf2) p using (supply_uuid)
      |  group by 1
      |)""".stripMargin

  // ---- time marts (mirror graft.marts.TimeMarts) ----

  val timeCtes: String =
    s"""time_spine as (
      |  select cast(unnest(generate_series($runDate - INTERVAL 3649 DAY, $runDate, INTERVAL 1 DAY)) as date) as date_day
      |),
      |daily_summary_raw as (
      |  select o.ordered_at as order_date,
      |    count(distinct o.order_id) as daily_orders,
      |    count(distinct o.customer_id) as daily_unique_customers,
      |    cast(sum(o.order_total) as decimal(18,2)) as rev_d,
      |    cast(sum(o.order_cost) as decimal(18,2)) as cost_d,
      |    count(o.order_id) as n,
      |    count(distinct case when o.customer_order_number = 1 then o.customer_id end) as daily_new_customers,
      |    count(distinct case when o.customer_order_number > 1 then o.customer_id end) as daily_returning_customers,
      |    count(case when o.is_promo_order then 1 end) as daily_promo_orders,
      |    count(case when o.has_returned_item then 1 end) as daily_returned_orders
      |  from orders_mart o group by 1
      |),
      |daily_summary as (
      |  select order_date, daily_orders, daily_unique_customers,
      |    rev_d as daily_revenue, cost_d as daily_cost,
      |    cast(rev_d - cost_d as decimal(18,2)) as daily_profit,
      |    case when n > 0 then cast(rev_d as double) / cast(n as double) end as daily_avg_order_value,
      |    daily_new_customers, daily_returning_customers, daily_promo_orders, daily_returned_orders
      |  from daily_summary_raw
      |),
      |weekly_summary_raw as (
      |  select date_trunc('week', o.ordered_at) as order_week,
      |    count(distinct o.order_id) as weekly_orders,
      |    count(distinct o.customer_id) as weekly_unique_customers,
      |    cast(sum(o.order_total) as decimal(18,2)) as rev_d,
      |    cast(sum(o.order_cost) as decimal(18,2)) as cost_d,
      |    count(o.order_id) as n
      |  from orders_mart o group by 1
      |),
      |weekly_summary as (
      |  select order_week, weekly_orders, weekly_unique_customers,
      |    cast(rev_d as double) as weekly_revenue,
      |    cast(cost_d as double) as weekly_cost,
      |    cast(rev_d - cost_d as double) as weekly_profit,
      |    case when n > 0 then cast(rev_d as double) / cast(n as double) end as weekly_avg_order_value
      |  from weekly_summary_raw
      |),
      |monthly_summary_raw as (
      |  select date_trunc('month', o.ordered_at) as order_month,
      |    extract(year from o.ordered_at) as order_year,
      |    extract(month from o.ordered_at) as order_month_num,
      |    extract(quarter from o.ordered_at) as order_quarter,
      |    count(distinct o.order_id) as monthly_orders,
      |    count(distinct o.customer_id) as monthly_unique_customers,
      |    cast(sum(o.order_total) as decimal(18,2)) as rev_d,
      |    cast(sum(o.order_cost) as decimal(18,2)) as cost_d,
      |    count(o.order_id) as n
      |  from orders_mart o group by 1,2,3,4
      |),
      |monthly_summary as (
      |  select order_month, monthly_orders, monthly_unique_customers,
      |    rev_d as monthly_revenue, cost_d as monthly_cost,
      |    cast(rev_d - cost_d as decimal(18,2)) as monthly_profit,
      |    case when n > 0 then cast(rev_d as double) / cast(n as double) end as monthly_avg_order_value,
      |    order_year, order_month_num, order_quarter
      |  from monthly_summary_raw
      |),
      |cohort_analysis as (
      |  select date_trunc('month', o.ordered_at) as cohort_month, o.customer_id,
      |    min(o.ordered_at) as first_order_date
      |  from orders_mart o group by 1,2
      |),
      |cohort_retention as (
      |  select date_trunc('month', first_order_date) as first_order_month,
      |    cohort_month,
      |    (extract(year from cohort_month) * 12 + extract(month from cohort_month))
      |      - (extract(year from date_trunc('month', first_order_date)) * 12 + extract(month from date_trunc('month', first_order_date))) as period_number,
      |    count(distinct customer_id) as customers
      |  from cohort_analysis
      |  group by 1,2,3
      |),
      |seasonal_trends_raw as (
      |  select extract(month from o.ordered_at) as month_of_year,
      |    extract(quarter from o.ordered_at) as quarter_of_year,
      |    dayofweek(o.ordered_at) + 1 as day_of_week,
      |    count(distinct o.order_id) as seasonal_orders,
      |    cast(sum(o.order_total) as decimal(18,2)) as rev_d,
      |    count(o.order_id) as n
      |  from orders_mart o group by 1,2,3
      |),
      |seasonal_trends as (
      |  select month_of_year, quarter_of_year, day_of_week, seasonal_orders,
      |    cast(rev_d as double) as seasonal_revenue,
      |    case when n > 0 then cast(rev_d as double) / cast(n as double) end as seasonal_avg_order_value
      |  from seasonal_trends_raw
      |),
      |growth_base as (
      |  select order_month, monthly_revenue, monthly_orders,
      |    lag(monthly_revenue, 1) over (order by order_month) as prev_month_revenue,
      |    lag(monthly_orders, 1) over (order by order_month) as prev_month_orders
      |  from monthly_summary
      |),
      |growth_metrics as (
      |  select order_month,
      |    cast(monthly_revenue as double) as monthly_revenue,
      |    cast(prev_month_revenue as double) as prev_month_revenue,
      |    prev_month_orders,
      |    case when prev_month_revenue > 0 then cast(monthly_revenue - prev_month_revenue as double) / cast(prev_month_revenue as double) end as revenue_growth_rate,
      |    case when prev_month_orders > 0 then cast(monthly_orders - prev_month_orders as double) / cast(prev_month_orders as double) end as order_growth_rate
      |  from growth_base
      |),
      |time_analytics as (
      |  select t.date_day,
      |    coalesce(d.daily_orders, 0) as daily_orders,
      |    cast(coalesce(d.daily_revenue, 0) as double) as daily_revenue,
      |    cast(coalesce(d.daily_profit, 0) as double) as daily_profit,
      |    coalesce(d.daily_unique_customers, 0) as daily_unique_customers,
      |    coalesce(d.daily_avg_order_value, 0) as daily_avg_order_value,
      |    date_trunc('week', t.date_day) as week_start,
      |    date_trunc('month', t.date_day) as month_start,
      |    extract(year from t.date_day) as year,
      |    extract(month from t.date_day) as month,
      |    extract(quarter from t.date_day) as quarter,
      |    dayofweek(t.date_day) + 1 as day_of_week
      |  from time_spine t
      |  left join daily_summary d on t.date_day = d.order_date
      |  where t.date_day >= DATE '1995-01-01' and t.date_day <= $runDate
      |)""".stripMargin

  // ---- customer segmentation (mirror graft.marts.SegmentationMart) ----

  private val segDays = s"date_diff('day', c.last_ordered_at, $runDate)"

  val segmentationCtes: String =
    s"""seg_rfm as (
      |  select c.customer_id, c.customer_name, c.customer_type,
      |    c.count_lifetime_orders, c.lifetime_spend, c.first_ordered_at, c.last_ordered_at,
      |    $segDays as days_since_last_order,
      |    c.count_lifetime_orders as frequency_score,
      |    c.lifetime_spend as monetary_score,
      |    case when $segDays <= 30 then 5 when $segDays <= 60 then 4
      |         when $segDays <= 90 then 3 when $segDays <= 180 then 2
      |         else 1 end as recency_score,
      |    case when c.count_lifetime_orders >= 13 then 5
      |         when c.count_lifetime_orders >= 11 then 4
      |         when c.count_lifetime_orders >= 9 then 3
      |         when c.count_lifetime_orders >= 7 then 2
      |         else 1 end as frequency_quintile,
      |    case when c.lifetime_spend >= 3300000 then 5
      |         when c.lifetime_spend >= 2700000 then 4
      |         when c.lifetime_spend >= 2200000 then 3
      |         when c.lifetime_spend >= 1700000 then 2
      |         else 1 end as monetary_quintile
      |  from customers_mart c
      |  where c.customer_id is not null
      |),
      |seg_segments as (
      |  select *,
      |    cast(recency_score + frequency_quintile + monetary_quintile as double) / 3.0 as rfm_score,
      |    case when recency_score >= 4 and frequency_quintile >= 4 and monetary_quintile >= 4 then 'Champions'
      |         when recency_score >= 3 and frequency_quintile >= 3 and monetary_quintile >= 3 then 'Loyal Customers'
      |         when recency_score >= 4 and frequency_quintile <= 2 and monetary_quintile >= 3 then 'Potential Loyalists'
      |         when recency_score >= 4 and frequency_quintile <= 2 and monetary_quintile <= 2 then 'New Customers'
      |         when recency_score >= 3 and frequency_quintile >= 2 and monetary_quintile <= 2 then 'Promising'
      |         when recency_score <= 2 and frequency_quintile >= 3 and monetary_quintile >= 3 then 'Need Attention'
      |         when recency_score <= 2 and frequency_quintile >= 2 and monetary_quintile >= 2 then 'About to Sleep'
      |         when recency_score <= 2 and frequency_quintile >= 4 and monetary_quintile <= 2 then 'At Risk'
      |         when recency_score <= 1 and frequency_quintile >= 4 and monetary_quintile >= 4 then 'Cannot Lose Them'
      |         when recency_score <= 2 and frequency_quintile <= 2 and monetary_quintile >= 3 then 'Hibernating'
      |         else 'Lost' end as rfm_segment
      |  from seg_rfm
      |),
      |seg_clv as (
      |  select customer_id,
      |    case when lifetime_spend >= 3500000 then 'High Value'
      |         when lifetime_spend >= 2500000 then 'Medium Value'
      |         when lifetime_spend >= 1500000 then 'Low Value'
      |         else 'Minimal Value' end as clv_tier,
      |    case when count_lifetime_orders >= 12 then 'Very Frequent'
      |         when count_lifetime_orders >= 9 then 'Frequent'
      |         when count_lifetime_orders >= 6 then 'Occasional'
      |         else 'Rare' end as purchase_frequency_tier
      |  from seg_rfm
      |),
      |seg_behavioral as (
      |  select o.customer_id,
      |    count(case when o.is_promo_order then 1 end) as promo_orders,
      |    count(case when o.has_returned_item then 1 end) as returned_orders,
      |    count(distinct o.location_id) as locations_visited,
      |    case when count(case when o.is_promo_order then 1 end) > count(case when o.has_returned_item then 1 end) then 'Promo Focused'
      |         when count(case when o.has_returned_item then 1 end) > count(case when o.is_promo_order then 1 end) then 'Return Heavy'
      |         else 'Balanced' end as product_preference,
      |    case when count(distinct o.location_id) >= 9 then 'Multi-Location'
      |         when count(distinct o.location_id) >= 7 then 'Two-Location'
      |         else 'Single-Location' end as location_behavior
      |  from orders_mart o group by 1
      |),
      |seg_items as (
      |  select oi.order_id, oi.product_id, oi.product_name, o.customer_id
      |  from order_items oi
      |  left join (select order_id, customer_id from orders_mart) o using (order_id)
      |),
      |seg_favorite as (
      |  select customer_id, product_name as favorite_product from (
      |    select customer_id, product_name,
      |      row_number() over (partition by customer_id order by count(*) desc, product_name) as rn
      |    from seg_items group by customer_id, product_name
      |  ) ranked where rn = 1
      |),
      |seg_prefs as (
      |  select p.customer_id, p.unique_products_purchased, f.favorite_product,
      |    case when p.unique_products_purchased >= 30 then 'Variety Seeker'
      |         when p.unique_products_purchased >= 15 then 'Moderate Variety'
      |         else 'Consistent Buyer' end as variety_preference
      |  from (select customer_id, count(distinct product_id) as unique_products_purchased
      |        from seg_items group by 1) p
      |  left join seg_favorite f using (customer_id)
      |),
      |seg_churn as (
      |  select customer_id,
      |    case when days_since_last_order > 180 then 'High Risk'
      |         when days_since_last_order > 90 then 'Medium Risk'
      |         when days_since_last_order > 60 then 'Low Risk'
      |         else 'Active' end as churn_risk,
      |    case when rfm_segment in ('Lost', 'Hibernating', 'Cannot Lose Them') then 'Immediate Action'
      |         when rfm_segment in ('At Risk', 'About to Sleep', 'Need Attention') then 'Monitor Closely'
      |         else 'Maintain' end as retention_action
      |  from seg_segments
      |),
      |customer_segmentation as (
      |  select s.customer_id, s.customer_name, s.customer_type, s.count_lifetime_orders,
      |    cast(s.lifetime_spend as double) as lifetime_spend,
      |    s.first_ordered_at, s.last_ordered_at, s.days_since_last_order,
      |    s.frequency_score, cast(s.monetary_score as double) as monetary_score,
      |    s.recency_score, s.frequency_quintile, s.monetary_quintile,
      |    s.rfm_score, s.rfm_segment,
      |    coalesce(c.clv_tier, 'Unknown') as clv_tier,
      |    coalesce(c.purchase_frequency_tier, 'Unknown') as purchase_frequency_tier,
      |    coalesce(b.promo_orders, 0) as promo_orders,
      |    coalesce(b.returned_orders, 0) as returned_orders,
      |    coalesce(b.locations_visited, 0) as locations_visited,
      |    coalesce(b.product_preference, 'Unknown') as product_preference,
      |    coalesce(b.location_behavior, 'Unknown') as location_behavior,
      |    coalesce(p.unique_products_purchased, 0) as unique_products_purchased,
      |    coalesce(p.favorite_product, 'Unknown') as favorite_product,
      |    coalesce(p.variety_preference, 'Unknown') as variety_preference,
      |    coalesce(ch.churn_risk, 'Unknown') as churn_risk,
      |    coalesce(ch.retention_action, 'Unknown') as retention_action
      |  from seg_segments s
      |  left join seg_clv c using (customer_id)
      |  left join seg_behavioral b using (customer_id)
      |  left join seg_prefs p using (customer_id)
      |  left join seg_churn ch using (customer_id)
      |)""".stripMargin

  /** Full WITH prefix: staging + core + analytics + time + segmentation
    * (DuckDB prunes unused CTEs, so sharing one prefix is free). */
  val allCtes: String =
    s"""$coreCtes,
       |$productsCtes,
       |$locationsCtes,
       |$suppliesCtes,
       |$timeCtes,
       |$segmentationCtes""".stripMargin

  // ---- per-query oracle statements ----

  /** Output-boundary decimal→double (mirrors graft.Out.presentDoubles):
    * decimal arithmetic stays exact inside the CTEs; only the final
    * select presents the named money columns as float64 so both engines
    * hash identical doubles (VERDICT r1 #1). DuckDB `* REPLACE` keeps
    * column order/names. */
  def asDouble(table: String, cols: String*): String =
    s"select * replace (${cols.map(c => s"cast($c as double) as $c").mkString(", ")}) from $table"

  val stgCustomersQ = s"$stagingCtes ${asDouble("stg_customers", "account_balance")}"
  val stgOrdersQ = s"$stagingCtes ${asDouble("stg_orders", "order_total", "subtotal", "tax_paid")}"
  val stgOrderItemsQ = s"$stagingCtes ${asDouble("stg_order_items", "quantity", "extended_price", "discounted_price")}"
  val stgProductsQ = s"$stagingCtes ${asDouble("stg_products", "product_price")}"
  val stgLocationsQ = s"$stagingCtes select * from stg_locations"
  val stgSuppliesQ = s"$stagingCtes ${asDouble("stg_supplies", "supply_cost")}"
  val orderItemsQ = s"$coreCtes ${asDouble("order_items",
    "product_price", "quantity", "extended_price", "discounted_price",
    "supply_cost", "gross_margin")}"
  val ordersQ = s"$coreCtes ${asDouble("orders_mart",
    "order_total", "subtotal", "tax_paid", "order_items_subtotal", "order_cost")}"
  val customersQ = s"$coreCtes ${asDouble("customers_mart",
    "account_balance", "lifetime_spend_pretax", "lifetime_tax_paid",
    "lifetime_spend", "lifetime_cost")}"

  /** The two customers-snapshot variants of Models.martChanges:
    * v1 = pre-cutoff orders minus the late-registration dim slice;
    * v2 = full orders minus the erasure slice. */
  private val snapshotCtes: String =
    s"""cust_v1 as (${customersBodyFrom(
        "(select * from stg_customers where customer_id % 17 <> 3)",
        "(select * from orders_mart where ordered_at < timestamp '2000-01-01')")}),
       |cust_v2 as (${customersBodyFrom(
        "(select * from stg_customers where customer_id % 101 <> 7)",
        "orders_mart")})""".stripMargin

  /** Mirror Models.martChanges / operators.Cdc: the CDF row set —
    * insert / delete / update_preimage / update_postimage — via
    * per-column IS DISTINCT FROM (the oracle twin of Spark's
    * null-safe `<=>`). */
  val martCdcQ: String = {
    val nonKeys = Seq("customer_name", "location_id", "account_balance",
      "market_segment", "count_lifetime_orders", "first_ordered_at",
      "last_ordered_at", "lifetime_spend_pretax", "lifetime_tax_paid",
      "lifetime_spend", "lifetime_cost", "customer_type")
    val differs = nonKeys.map(c => s"b.$c is distinct from a.$c").mkString(" or ")
    s"""$coreCtes,
       |$snapshotCtes,
       |cdc as (
       |  select a.*, 'insert' as _change_type
       |  from cust_v2 a left join cust_v1 b on a.customer_id = b.customer_id
       |  where b.customer_id is null
       |  union all
       |  select b.*, 'delete' as _change_type
       |  from cust_v1 b left join cust_v2 a on a.customer_id = b.customer_id
       |  where a.customer_id is null
       |  union all
       |  select b.*, 'update_preimage' as _change_type
       |  from cust_v1 b join cust_v2 a on a.customer_id = b.customer_id
       |  where $differs
       |  union all
       |  select a.*, 'update_postimage' as _change_type
       |  from cust_v1 b join cust_v2 a on a.customer_id = b.customer_id
       |  where $differs
       |)
       |${asDouble("cdc", "account_balance", "lifetime_spend_pretax",
        "lifetime_tax_paid", "lifetime_spend", "lifetime_cost")}""".stripMargin
  }

  /** Mirror operators/Stats.corrMatrix over stg_orders' money columns:
    * exact unscaled cents as HUGEINT (int128 — a width-≤18 decimal
    * multiply overflows DuckDB's int64 lanes), one-pass exact moments,
    * and the textbook Pearson identity with the three double casts as
    * the only floating steps — identical IEEE ops to Spark's. */
  val orderCorrelationsQ: String = {
    val cols = Seq("order_total", "subtotal", "tax_paid")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val centSel = cols.map(c => s"cast($c * 100 as hugeint) as $c").mkString(", ")
    val sums = cols.flatMap(c =>
      Seq(s"sum($c) as s_$c", s"sum($c * $c) as ss_$c")) ++
      pairs.map { case (a, b) => s"sum($a * $b) as sp_${a}_$b" }
    def corr(a: String, b: String) =
      s"cast(n * sp_${a}_$b - s_$a * s_$b as double) / " +
        s"sqrt(cast(n * ss_$a - s_$a * s_$a as double) * " +
        s"cast(n * ss_$b - s_$b * s_$b as double))"
    val arms = pairs.map { case (a, b) =>
      s"select '$a' as col_x, '$b' as col_y, n, ${corr(a, b)} as corr from s"
    }.mkString("\nunion all\n")
    s"""$stagingCtes,
       |c as (
       |  select $centSel from stg_orders
       |  where ${cols.map(c => s"$c is not null").mkString(" and ")}
       |),
       |s as (select count(*) as n, ${sums.mkString(", ")} from c)
       |$arms""".stripMargin
  }

  /** Mirror Models.customersScd2 / operators.Snapshot: init(v1, t1)
    * then run(v2, t2) — carried rows keep (t1, null), changed/deleted
    * v1 rows close at t2, new keys and new versions open at t2.
    * Change detection is the same all-non-key-column null-safe
    * comparison (IS DISTINCT FROM ≡ Spark's md5-digest inequality). */
  val customersScd2Q: String = {
    val nonKeys = Seq("customer_name", "location_id", "account_balance",
      "market_segment", "count_lifetime_orders", "first_ordered_at",
      "last_ordered_at", "lifetime_spend_pretax", "lifetime_tax_paid",
      "lifetime_spend", "lifetime_cost", "customer_type")
    val differs = nonKeys.map(c => s"b.$c is distinct from a.$c").mkString(" or ")
    s"""$coreCtes,
       |$snapshotCtes,
       |scd2 as (
       |  -- carried: in both states, unchanged -> still open from t1
       |  select b.*, timestamp '2001-08-15 00:00:00' as dbt_valid_from,
       |    cast(null as timestamp) as dbt_valid_to
       |  from cust_v1 b join cust_v2 a using (customer_id)
       |  where not ($differs)
       |  union all
       |  -- closed: v1 rows whose key changed or vanished
       |  select b.*, timestamp '2001-08-15 00:00:00' as dbt_valid_from,
       |    timestamp '2001-08-16 00:00:00' as dbt_valid_to
       |  from cust_v1 b left join cust_v2 a using (customer_id)
       |  where a.customer_id is null or $differs
       |  union all
       |  -- opened: new keys and new versions of changed keys
       |  select a.*, timestamp '2001-08-16 00:00:00' as dbt_valid_from,
       |    cast(null as timestamp) as dbt_valid_to
       |  from cust_v2 a left join cust_v1 b using (customer_id)
       |  where b.customer_id is null or $differs
       |)
       |${asDouble("scd2", "account_balance", "lifetime_spend_pretax",
        "lifetime_tax_paid", "lifetime_spend", "lifetime_cost")}""".stripMargin
  }

  /** Mirror Models.cdcIncrementalAgg: the maintained aggregate must
    * equal a straight re-aggregation of the AFTER snapshot — the IVM
    * invariant, enforced by the hash gate itself. */
  val cdcIncrementalAggQ: String =
    s"""$coreCtes,
       |$snapshotCtes
       |select customer_type, count(*) as n_customers,
       |  cast(sum(lifetime_spend) as double) as total_lifetime_spend
       |from cust_v2 group by 1""".stripMargin

  /** Mirror operators/Quantiles.exactBuckets(customers,
    * lifetime_spend, 10): the REAL SQL window functions over the same
    * strict (lifetime_spend desc nulls last, customer_id) order — the
    * two-phase rank + integer bucket arithmetic must be byte-identical
    * to the single-window form. */
  val customerValueDecilesQ: String =
    s"""$coreCtes
       |select customer_id,
       |  cast(row_number() over w as int) as value_rank,
       |  cast(ntile(10) over w as int) as bucket,
       |  percent_rank() over w as pct_rank,
       |  cume_dist() over w as cume_dist
       |from customers_mart
       |window w as (order by lifetime_spend desc nulls last, customer_id)""".stripMargin

  /** Mirror AnalyticsMarts.topProductsPerSupplier: the window form of
    * the same grouped top-k — row_number over (rev desc, product_id),
    * the exact total order the bounded heap keeps. */
  val topProductsPerSupplierQ: String = {
    import graft.marts.AnalyticsMarts.TopProductsK
    s"""$coreCtes,
       |sup_rev as (
       |  select supplier_id, product_id,
       |    cast(sum(discounted_price) as double) as product_revenue
       |  from order_items group by 1, 2
       |),
       |sup_rnk as (
       |  select supplier_id, product_id, product_revenue,
       |    cast(row_number() over (partition by supplier_id
       |      order by product_revenue desc, product_id) as int) as product_rank
       |  from sup_rev
       |)
       |select supplier_id, product_rank, product_id, product_revenue
       |from sup_rnk where product_rank <= $TopProductsK""".stripMargin
  }

  /** Mirror operators/Profile.profile(orders): one per-column arm
    * over the SAME shared column list (Models.OrdersProfileCols) —
    * the oracle re-derives each (n_rows, n_nulls, n_distinct) row
    * with plain aggregates. */
  val ordersProfileQ: String = {
    val arms = graft.Models.OrdersProfileCols.map(c =>
      s"""select '$c' as column_name, count(*) as n_rows,
         |  count(*) - count($c) as n_nulls,
         |  count(distinct $c) as n_distinct from orders_mart""".stripMargin)
      .mkString("\nunion all\n")
    s"$coreCtes $arms"
  }

  val productsQ = s"$allCtes ${asDouble("products_mart", "product_price")}"
  val locationsQ = s"$allCtes select * from locations_mart"
  val suppliesQ = s"$allCtes select * from supplies_mart"
  val supplierRollupQ = s"$allCtes select * from supplier_rollup"
  val timeSpineQ = s"$allCtes select * from time_spine"
  val dailySummaryQ = s"$allCtes ${asDouble("daily_summary",
    "daily_revenue", "daily_cost", "daily_profit")}"
  /** Mirror operators/Unpivot.melt over the daily mart: the UNION ALL
    * form of the same reshape (Spark runs it as one Expand pass), each
    * metric cast to double exactly as the Spark side does at the melt
    * boundary. Metric list shared via Models.DailyMeltMetrics. */
  val dailyMetricsLongQ: String = {
    val arms = graft.Models.DailyMeltMetrics.map(m =>
      s"select order_date, '$m' as metric, cast($m as double) as value from daily_summary")
      .mkString("\nunion all\n")
    s"$allCtes $arms"
  }
  val weeklySummaryQ = s"$allCtes select * from weekly_summary"
  val monthlySummaryQ = s"$allCtes ${asDouble("monthly_summary",
    "monthly_revenue", "monthly_cost", "monthly_profit")}"
  val cohortRetentionQ = s"$allCtes select * from cohort_retention"
  /** Mirror of TimeMarts.monthlyOrderStats: identical ANSI window
    * functions over the same unique ordering. */
  val monthlyOrderStatsQ: String =
    s"""$coreCtes
       |select order_id,
       |  date_trunc('month', ordered_at) as order_month,
       |  cast(order_total as double) as order_total,
       |  percent_rank() over w as pct_rank_in_month,
       |  cume_dist() over w as cume_dist_in_month,
       |  cast(ntile(4) over w as int) as quartile_in_month
       |from orders_mart
       |window w as (partition by date_trunc('month', ordered_at)
       |             order by order_total, order_id)""".stripMargin

  /** Mirror of TimeMarts.quarterlyRevenuePivot: pivot IS conditional
    * aggregation — spelled out as CASE sums. */
  val quarterlyRevenuePivotQ: String = {
    val qs = (1 to 4).map(q =>
      s"cast(cast(sum(case when quarter(ordered_at) = $q then order_total end) as decimal(18,2)) as double) as q${q}_revenue")
      .mkString(",\n  ")
    s"""$coreCtes
       |select year(ordered_at) as order_year,
       |  $qs
       |from orders_mart group by 1""".stripMargin
  }

  /** Mirror of TimeMarts.revenueRollup: GROUP BY ROLLUP with the same
    * grouping-bit order (first column = MSB in both engines). */
  val revenueRollupQ: String =
    s"""$coreCtes
       |select year(ordered_at) as order_year,
       |  quarter(ordered_at) as order_quarter,
       |  month(ordered_at) as order_month_num,
       |  cast(grouping(year(ordered_at), quarter(ordered_at), month(ordered_at)) as bigint) as gid,
       |  count(order_id) as n_orders,
       |  count(distinct customer_id) as n_customers,
       |  cast(cast(sum(order_total) as decimal(18,2)) as double) as revenue
       |from orders_mart
       |group by rollup(1, 2, 3)""".stripMargin
  /** Mirror of TimeMarts.revenueCube: GROUP BY CUBE with the same
    * grouping-bit order. */
  val revenueCubeQ: String =
    s"""$coreCtes
       |select year(ordered_at) as order_year,
       |  is_promo_order,
       |  cast(grouping(year(ordered_at), is_promo_order) as bigint) as gid,
       |  count(order_id) as n_orders,
       |  cast(cast(sum(order_total) as decimal(18,2)) as double) as revenue
       |from orders_mart
       |group by cube(1, 2)""".stripMargin

  /** Mirror TimeMarts.revenueGroupingSets: the same explicit set list,
    * the same grouping-bit convention, revenue presented as double. */
  val revenueGroupingSetsQ: String =
    s"""$coreCtes
       |select cast(date_trunc('month', ordered_at) as date) as order_month,
       |  is_promo_order,
       |  cast(grouping(cast(date_trunc('month', ordered_at) as date), is_promo_order) as bigint) as gid,
       |  count(order_id) as n_orders,
       |  cast(cast(sum(order_total) as decimal(18,2)) as double) as revenue
       |from orders_mart
       |group by grouping sets ((1), (2), ())""".stripMargin

  /** Mirror TimeMarts.ewmaAnomalies: exact-integer cents × power-of-two
    * weights over the bounded lookback self-join, the same two
    * fixed-order boundary divisions, the same wsum>0 guard (NaN
    * comparison semantics differ across engines, so 0-revenue
    * baselines must stay null, never NaN). */
  val ewmaAnomaliesQ: String = {
    import graft.marts.TimeMarts.{EwmaHorizon, EwmaMinDays, EwmaRelDev}
    s"""$allCtes,
       |ew_c as (
       |  select order_date, daily_revenue,
       |    cast(daily_revenue * 100 as bigint) as cents
       |  from daily_summary
       |),
       |ew_j as (
       |  select c.order_date, c.daily_revenue, c.cents,
       |    count(p.cents) as n_base,
       |    sum(p.cents * (cast(1 as bigint) << ($EwmaHorizon - (c.order_date - p.order_date)))) as wsum,
       |    sum(case when p.cents is not null
       |        then (cast(1 as bigint) << ($EwmaHorizon - (c.order_date - p.order_date))) end) as wden
       |  from ew_c c left join ew_c p
       |    on c.order_date - p.order_date between 1 and $EwmaHorizon
       |  group by 1, 2, 3
       |)
       |select order_date,
       |  cast(daily_revenue as double) as daily_revenue,
       |  cast(n_base as bigint) as n_base,
       |  case when n_base >= $EwmaMinDays
       |    then cast(wsum as double) / cast(wden as double) / 100.0 end as ewma_baseline,
       |  case when n_base >= $EwmaMinDays and wsum > 0
       |    then cast(abs(cents * wden - wsum) as double) / cast(wsum as double) end as rel_dev,
       |  case when n_base >= $EwmaMinDays and wsum > 0
       |    then cast(abs(cents * wden - wsum) as double) / cast(wsum as double) > $EwmaRelDev
       |  end as is_spike
       |from ew_j""".stripMargin
  }

  /** Mirror TimeMarts.revenueCusum: the closed-form two-sided CUSUM —
    * prefix sums of n-scaled exact-integer deviations with the
    * S div 20 slack, prefix extrema for the max(0,·) clamp, the same
    * two scale-free output divisions, the 2·S alarm threshold. All
    * window aggregates are exact integers (the window-double segment
    * tree caveat never applies). */
  val revenueCusumQ: String = {
    import graft.marts.TimeMarts.{CusumSlackDiv, CusumAlarmMeanDays}
    s"""$allCtes,
       |cu_c as (
       |  select order_date, daily_revenue,
       |    cast(daily_revenue * 100 as bigint) as cents
       |  from daily_summary
       |),
       |cu_t as (select count(*) as n, sum(cents) as s from cu_c),
       |cu_s as (
       |  select order_date, daily_revenue, s,
       |    n * cents - s - (s // $CusumSlackDiv) as adj_pos,
       |    n * cents - s + (s // $CusumSlackDiv) as adj_neg
       |  from cu_c cross join cu_t
       |),
       |cu_p as (
       |  select *,
       |    sum(adj_pos) over w as p_pos,
       |    sum(adj_neg) over w as p_neg
       |  from cu_s
       |  window w as (order by order_date
       |               rows between unbounded preceding and current row)
       |),
       |cu_f as (
       |  -- DuckDB window-sums bigint into HUGEINT; values fit int64
       |  -- (CusumSpec asserts the headroom), so narrow back
       |  select *,
       |    cast(p_pos - least(min(p_pos) over w, 0) as bigint) as cusum_pos,
       |    cast(greatest(max(p_neg) over w, 0) - p_neg as bigint) as cusum_neg
       |  from cu_p
       |  window w as (order by order_date
       |               rows between unbounded preceding and current row)
       |)
       |select order_date,
       |  cast(daily_revenue as double) as daily_revenue,
       |  cusum_pos, cusum_neg,
       |  cast(cusum_pos as double) / cast(s as double) as cusum_pos_days,
       |  cast(cusum_neg as double) / cast(s as double) as cusum_neg_days,
       |  cusum_pos > $CusumAlarmMeanDays * s as alarm_pos,
       |  cusum_neg > $CusumAlarmMeanDays * s as alarm_neg
       |from cu_f""".stripMargin
  }

  /** Mirror TimeMarts.revenueTheilSen: the same exact-cents pair
    * slopes (one IEEE division each), the same lower-median element
    * picks under the (value, date...) total order, the same residual
    * arithmetic with the selected slope. */
  /** The Theil-Sen fit as a shared CTE chain ending in `ts_line`
    * (n_days, n_pairs, slope_cents_per_day, intercept_cents) — read
    * by [[revenueTheilSenQ]] and [[revenueStlQ]] (Spark serves both
    * from the Mat'd 1-row table). */
  private val theilSenCtes: String =
    s"""ts_b as (
       |  select order_date,
       |    cast(order_date - date '1970-01-01' as bigint) as d,
       |    cast(daily_revenue * 100 as bigint) as c
       |  from daily_summary
       |),
       |ts_p as materialized (
       |  select a.order_date as date_a, b.order_date as date_b,
       |    cast(b.c - a.c as double) / cast(b.d - a.d as double) as slope
       |  from ts_b a join ts_b b on a.d < b.d
       |),
       |ts_np as (select cast(count(*) as bigint) as n_pairs from ts_p),
       |ts_s as (
       |  select slope, n_pairs from (
       |    select slope,
       |      row_number() over (order by slope, date_a, date_b) as rn
       |    from ts_p) t cross join ts_np
       |  where rn = (n_pairs + 1) // 2
       |),
       |ts_r as (
       |  select b.order_date, s.n_pairs, s.slope,
       |    cast(b.c as double) - s.slope * cast(b.d as double) as r
       |  from ts_b b cross join ts_s s
       |),
       |ts_nd as (select cast(count(*) as bigint) as n_days from ts_b),
       |ts_line as (
       |  select n_days, n_pairs, slope as slope_cents_per_day,
       |    r as intercept_cents
       |  from (select *, row_number() over (order by r, order_date) as rn
       |        from ts_r) t
       |  cross join ts_nd
       |  where rn = (n_days + 1) // 2
       |)""".stripMargin

  val revenueTheilSenQ: String =
    s"""$allCtes,
       |$theilSenCtes
       |select n_days, n_pairs, slope_cents_per_day, intercept_cents
       |from ts_line""".stripMargin

  /** Mirror TimeMarts.revenueStl: the Theil-Sen line, the d%7
    * day-of-week key, per-dow means of the detrended series folded in
    * day order, centering folded in dow order, and the six variance
    * moments folded in day order — every cross-row double sum a fixed
    * ordered list_reduce, every strength the same fixed tree. */
  val revenueStlQ: String =
    s"""$allCtes,
       |$theilSenCtes,
       |stl_d as (
       |  select b.order_date, b.d, b.c as cents,
       |    l.slope_cents_per_day * cast(b.d as double) + l.intercept_cents
       |      as trend,
       |    cast(b.c as double)
       |      - (l.slope_cents_per_day * cast(b.d as double)
       |         + l.intercept_cents) as detrended,
       |    ((b.d % 7) + 7) % 7 as dow_key
       |  from ts_b b cross join ts_line l
       |),
       |stl_s0 as (
       |  select dow_key, cast(count(*) as bigint) as n_dow,
       |    list_reduce(list(detrended order by d), (a, x) -> a + x)
       |      / cast(count(*) as double) as seasonal_raw
       |  from stl_d group by 1
       |),
       |stl_adj as (
       |  select list_reduce(list(seasonal_raw order by dow_key),
       |      (a, x) -> a + x) / cast(count(*) as double) as adj
       |  from stl_s0
       |),
       |stl_s as (
       |  select dow_key, seasonal_raw - adj as seasonal
       |  from stl_s0 cross join stl_adj
       |),
       |stl_r as (
       |  select d.order_date, d.d, d.cents, d.trend, d.detrended, s.seasonal,
       |    d.detrended - s.seasonal as remainder,
       |    cast(d.cents as double) - s.seasonal as deseason
       |  from stl_d d join stl_s s using (dow_key)
       |),
       |stl_v as (
       |  select cast(count(*) as double) as nd,
       |    list_reduce(list(remainder order by d), (a, x) -> a + x) as s_r,
       |    list_reduce(list(remainder * remainder order by d),
       |      (a, x) -> a + x) as s_r2,
       |    list_reduce(list(detrended order by d), (a, x) -> a + x) as s_dt,
       |    list_reduce(list(detrended * detrended order by d),
       |      (a, x) -> a + x) as s_dt2,
       |    list_reduce(list(deseason order by d), (a, x) -> a + x) as s_ds,
       |    list_reduce(list(deseason * deseason order by d),
       |      (a, x) -> a + x) as s_ds2
       |  from stl_r
       |),
       |stl_f as (
       |  select
       |    case when (s_dt2 / nd - (s_dt / nd) * (s_dt / nd)) > 0
       |      then greatest(0.0, 1.0
       |        - (s_r2 / nd - (s_r / nd) * (s_r / nd))
       |          / (s_dt2 / nd - (s_dt / nd) * (s_dt / nd))) end
       |      as seasonal_strength,
       |    case when (s_ds2 / nd - (s_ds / nd) * (s_ds / nd)) > 0
       |      then greatest(0.0, 1.0
       |        - (s_r2 / nd - (s_r / nd) * (s_r / nd))
       |          / (s_ds2 / nd - (s_ds / nd) * (s_ds / nd))) end
       |      as trend_strength
       |  from stl_v
       |)
       |select r.order_date, r.cents, r.trend, r.seasonal, r.remainder,
       |  f.seasonal_strength, f.trend_strength
       |from stl_r r cross join stl_f f""".stripMargin

  /** Integer division by [[graft.marts.TimeMarts.HoltDiv]]. PROBED,
    * not assumed (a falling Holt trend goes negative, where floor and
    * truncation part ways): Spark's `div` AND DuckDB's `//` both
    * truncate toward zero (−7 div 4 = −7 // 4 = −1), so the recursion
    * mirrors with no correction term. HoltSpec pins a negative-trend
    * series against the driver-side reference. */
  private def tdiv4(x: String): String =
    s"(($x) // ${graft.marts.TimeMarts.HoltDiv})"

  /** Mirror TimeMarts.revenueHolt: the identical exact-int64 level/
    * trend recursion (Spark's one-pass array fold ≡ this recursive
    * CTE — exactness makes the mechanisms equivalent, the Kaplan-
    * Meier precedent), truncation-aligned division, the same lag-1
    * forecast and single-division outputs. */
  val revenueHoltQ: String = {
    import graft.marts.TimeMarts.HoltRelDev
    val lvl = tdiv4("k.cents + 3 * (r.level + r.trend)")
    s"""$allCtes,
       |ho_c as (
       |  select order_date, cast(daily_revenue * 100 as bigint) as cents
       |  from daily_summary
       |),
       |ho_i as (
       |  select row_number() over (order by order_date) as i, order_date, cents
       |  from ho_c
       |),
       |ho_s as (
       |  with recursive rec as (
       |    select a.i, a.order_date, a.cents,
       |      a.cents as level, b.cents - a.cents as trend
       |    from ho_i a join ho_i b on b.i = 2 where a.i = 1
       |    union all
       |    select k.i, k.order_date, k.cents,
       |      $lvl as level,
       |      ${tdiv4(s"($lvl - r.level) + 3 * r.trend")} as trend
       |    from rec r join ho_i k on k.i = r.i + 1)
       |  select * from rec
       |),
       |ho_f as (
       |  select order_date, cents, level, trend,
       |    lag(level + trend) over (order by order_date) as forecast
       |  from ho_s
       |)
       |select order_date, cents, level, trend, forecast,
       |  cents - forecast as residual,
       |  case when forecast > 0
       |    then cast(abs(cents - forecast) as double) / cast(forecast as double)
       |    end as rel_dev,
       |  case when forecast > 0
       |    then cast(abs(cents - forecast) as double) / cast(forecast as double)
       |      > ${dlit(HoltRelDev)} end as is_spike
       |from ho_f""".stripMargin
  }

  /** Mirror TimeMarts.eventVolumeHw: the same seeded Holt-Winters
    * recursion as a recursive CTE over a LIST column (list_append +
    * [2:7] slice keep the rolling m-window; truncating `//` aligns
    * with Spark's div). Zero rows below n = 2m on both engines. */
  val eventVolumeHwQ: String = {
    val wl = "(k.v - r.seas[1] + 3 * (r.l + r.b)) // 4"
    s"""with ev_d as (
       |  select cast(ts as date) as event_date,
       |    cast(count(*) as bigint) as v
       |  from events group by 1
       |),
       |ev_i as (
       |  select row_number() over (order by event_date) as i, event_date, v
       |  from ev_d
       |),
       |ev_n as (select count(*) as n from ev_i),
       |ev_seed as (
       |  select cast(sum(case when i <= 7 then v end) as bigint) as sum1,
       |    cast(sum(case when i > 7 and i <= 14 then v end) as bigint) as sum2
       |  from ev_i where (select n from ev_n) >= 14
       |),
       |ev_s0 as (
       |  select list(v - (select sum1 // 7 from ev_seed) order by i) as seas
       |  from ev_i where i <= 7
       |),
       |ev_r as (
       |  with recursive rec(i, l, b, seas, s, f) as (
       |    select 7, sum1 // 7, (sum2 - sum1) // 49,
       |      (select seas from ev_s0),
       |      cast(null as bigint), cast(null as bigint)
       |    from ev_seed
       |    -- n < 14 leaves ev_seed as ONE all-NULL row (ungrouped
       |    -- aggregate over zero rows), not zero rows; gating the seed
       |    -- on a real sum keeps the zero-rows-below-2m contract that
       |    -- Spark's n >= 2m filter enforces (ADVICE r15)
       |    where sum1 is not null
       |    union all
       |    select k.i,
       |      $wl,
       |      (($wl) - r.l + 3 * r.b) // 4,
       |      list_append(r.seas[2:7], ((k.v - ($wl)) + 3 * r.seas[1]) // 4),
       |      ((k.v - ($wl)) + 3 * r.seas[1]) // 4,
       |      r.l + r.b + r.seas[1]
       |    from rec r join ev_i k on k.i = r.i + 1)
       |  select * from rec
       |)
       |select v.event_date, v.v as n_events, r.l as level, r.b as trend,
       |  r.s as seasonal, r.f as forecast, v.v - r.f as residual
       |from ev_r r join ev_i v on v.i = r.i
       |where r.i >= 8""".stripMargin
  }

  /** Mirror TimeMarts.forecastEval: per series, a holt and a hw
    * recursive CTE folded to the FROZEN end-of-train state, then a
    * generate_series holdout join; exact int64 error sums, two output
    * divisions. The `where holt_abs is not null` guard mirrors
    * Spark's zero-rows contract for sub-2m train windows (an
    * ungrouped sum over zero joined rows is one NULL row here). */
  val forecastEvalQ: String = {
    def series(p: String, src: String): String = {
      val lvl = s"(k.v + 3 * (r.l + r.b)) // 4"
      val wl = s"(k.v - r.seas[1] + 3 * (r.l + r.b)) // 4"
      s"""${p}_n as (select count(*) - 7 as tn from $src),
         |${p}_holt as (
         |  with recursive rec(i, l, b) as (
         |    select 1, a.v, b.v - a.v
         |    from $src a join $src b on b.i = 2
         |    where a.i = 1 and (select tn from ${p}_n) >= 14
         |    union all
         |    select k.i, $lvl, (($lvl) - r.l + 3 * r.b) // 4
         |    from rec r join $src k on k.i = r.i + 1
         |    where k.i <= (select tn from ${p}_n))
         |  select l, b from rec where i = (select tn from ${p}_n)
         |),
         |${p}_seed as (
         |  select cast(sum(case when i <= 7 then v end) as bigint) as sum1,
         |    cast(sum(case when i > 7 and i <= 14 then v end) as bigint) as sum2
         |  from $src where (select tn from ${p}_n) >= 14
         |),
         |${p}_s0 as (
         |  select list(v - (select sum1 // 7 from ${p}_seed) order by i) as seas
         |  from $src where i <= 7
         |),
         |${p}_hw as (
         |  with recursive rec(i, l, b, seas) as (
         |    select 7, sum1 // 7, (sum2 - sum1) // 49,
         |      (select seas from ${p}_s0)
         |    from ${p}_seed
         |    union all
         |    select k.i, $wl, (($wl) - r.l + 3 * r.b) // 4,
         |      list_append(r.seas[2:7], ((k.v - ($wl)) + 3 * r.seas[1]) // 4)
         |    from rec r join $src k on k.i = r.i + 1
         |    where k.i <= (select tn from ${p}_n))
         |  select l, b, seas from rec where i = (select tn from ${p}_n)
         |),
         |${p}_err as (
         |  select
         |    cast(sum(abs(k.v - (h.l + g.h * h.b))) as bigint) as holt_abs,
         |    cast(sum(abs(k.v - (w.l + g.h * w.b
         |      + w.seas[((g.h - 1) % 7) + 1]))) as bigint) as hw_abs,
         |    cast(sum(k.v) as bigint) as act,
         |    cast(max((select tn from ${p}_n)) as bigint) as n_train
         |  from generate_series(1, 7) g(h)
         |  join $src k on k.i = (select tn from ${p}_n) + g.h
         |  cross join ${p}_holt h cross join ${p}_hw w
         |)""".stripMargin
    }
    def arms(p: String, name: String): String =
      s"""select '$name' as series, 'holt' as model, n_train,
         |  cast(7 as bigint) as n_test,
         |  cast(holt_abs as double) / cast(7 as double) as mae,
         |  cast(holt_abs as double) / cast(act as double) as wmape
         |from ${p}_err where holt_abs is not null
         |union all
         |select '$name', 'hw', n_train, cast(7 as bigint),
         |  cast(hw_abs as double) / cast(7 as double),
         |  cast(hw_abs as double) / cast(act as double)
         |from ${p}_err where hw_abs is not null""".stripMargin
    s"""$allCtes,
       |fe_rev as (
       |  select row_number() over (order by order_date) as i,
       |    cast(daily_revenue * 100 as bigint) as v
       |  from daily_summary
       |),
       |fe_evd as (
       |  select cast(ts as date) as d, cast(count(*) as bigint) as v
       |  from events group by 1
       |),
       |fe_ev as (
       |  select row_number() over (order by d) as i, v from fe_evd
       |),
       |${series("fr", "fe_rev")},
       |${series("fv", "fe_ev")}
       |${arms("fr", "daily_revenue_cents")}
       |union all
       |${arms("fv", "event_volume")}""".stripMargin
  }

  /** Mirror TimeMarts.mannKendall: the same calendar pair domain,
    * exact-int sign sum and tie-corrected variance numerator, the
    * identical z chain. */
  val mannKendallQ: String = {
    import graft.marts.TimeMarts.Z05
    s"""$allCtes,
       |mk_b as (
       |  select order_date, cast(daily_revenue * 100 as bigint) as c
       |  from daily_summary
       |),
       |mk_n as (select count(*) as n_days from mk_b),
       |mk_s as (
       |  select cast(sum(cast(sign(b.c - a.c) as bigint)) as bigint) as s_stat
       |  from mk_b a join mk_b b on a.order_date < b.order_date
       |),
       |mk_t as (
       |  select cast(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) as bigint) as tie18
       |  from (select count(*) as t from mk_b group by c) g
       |),
       |mk_v as (
       |  select n_days, s_stat,
       |    n_days * (n_days - 1) * (2 * n_days + 5) - tie18 as var18
       |  from mk_n cross join mk_s cross join mk_t
       |)
       |select n_days, s_stat, var18,
       |  case when s_stat > 0
       |         then cast(s_stat - 1 as double) / sqrt(cast(var18 as double) / 18.0)
       |       when s_stat < 0
       |         then cast(s_stat + 1 as double) / sqrt(cast(var18 as double) / 18.0)
       |       else 0.0e0 end as z,
       |  case when s_stat > 0
       |         then cast(s_stat - 1 as double) / sqrt(cast(var18 as double) / 18.0)
       |       when s_stat < 0
       |         then cast(s_stat + 1 as double) / sqrt(cast(var18 as double) / 18.0)
       |       else 0.0e0 end > ${dlit(Z05)} as trend_up_05,
       |  case when s_stat > 0
       |         then cast(s_stat - 1 as double) / sqrt(cast(var18 as double) / 18.0)
       |       when s_stat < 0
       |         then cast(s_stat + 1 as double) / sqrt(cast(var18 as double) / 18.0)
       |       else 0.0e0 end < -${dlit(Z05)} as trend_down_05
       |from mk_v""".stripMargin
  }

  /** Mirror TimeMarts.revenueRunsTest: the same lower-median element
    * pick, the same drop-ties sign reduction, exact run count via the
    * lag transition count, the identical z chain. */
  val revenueRunsTestQ: String = {
    import graft.marts.TimeMarts.Z05
    s"""$allCtes,
       |rt_b as (
       |  select order_date, cast(daily_revenue * 100 as bigint) as c
       |  from daily_summary
       |),
       |rt_n as (select count(*) as n_all from rt_b),
       |rt_m as (
       |  select c as med from (
       |    select c, row_number() over (order by c, order_date) as rn
       |    from rt_b) t cross join rt_n
       |  where rn = (n_all + 1) // 2
       |),
       |rt_s as (
       |  select order_date, c > med as up
       |  from rt_b cross join rt_m where c <> med
       |),
       |rt_l as (
       |  select up, lag(up) over (order by order_date) as prev from rt_s
       |),
       |rt_a as (
       |  select
       |    count(case when up then 1 end) as n_above,
       |    count(case when not up then 1 end) as n_below,
       |    count(case when prev is null or prev <> up then 1 end) as runs
       |  from rt_l
       |),
       |rt_f as (
       |  select n_above + n_below as n, n_above, n_below, runs,
       |    2 * n_above * n_below as two_ab
       |  from rt_a
       |)
       |select n, n_above, n_below, runs,
       |  (cast(runs as double)
       |    - (1.0e0 + cast(two_ab as double) / cast(n as double)))
       |    / sqrt(cast(two_ab * (two_ab - n) as double)
       |      / cast(n * n * (n - 1) as double)) as z,
       |  abs((cast(runs as double)
       |    - (1.0e0 + cast(two_ab as double) / cast(n as double)))
       |    / sqrt(cast(two_ab * (two_ab - n) as double)
       |      / cast(n * n * (n - 1) as double))) <= ${dlit(Z05)} as random_05
       |from rt_f""".stripMargin
  }

  /** Mirror TimeMarts.revenueAutocorr: the same calendar lag joins;
    * sufficient statistics as decimal(19,0)-widened exact products
    * (the int128 path — cents² over a decade overflows int64), final
    * arithmetic in HUGEINT (the same exact integers Spark's capped
    * scale-0 decimals hold), one division over one sqrt. */
  val revenueAutocorrQ: String = {
    import graft.marts.TimeMarts.AutocorrLags
    val arms = AutocorrLags.map { k =>
      s"""select $k as lag, m as n_pairs,
         |  cast(cast(m as hugeint) * cast(sxy as hugeint)
         |    - cast(sx as hugeint) * cast(sy as hugeint) as double)
         |    / sqrt(cast(cast(m as hugeint) * cast(sxx as hugeint)
         |        - cast(sx as hugeint) * cast(sx as hugeint) as double)
         |      * cast(cast(m as hugeint) * cast(syy as hugeint)
         |        - cast(sy as hugeint) * cast(sy as hugeint) as double))
         |    as autocorr
         |from (
         |  select count(*) as m,
         |    sum(a.c) as sx, sum(b.c) as sy,
         |    sum(a.c * a.c) as sxx, sum(b.c * b.c) as syy,
         |    sum(a.c * b.c) as sxy
         |  from ac_b a join ac_b b on b.order_date = a.order_date + $k
         |) t""".stripMargin
    }.mkString("\nunion all\n")
    s"""$allCtes,
       |ac_b as (
       |  select order_date,
       |    cast(cast(daily_revenue * 100 as bigint) as decimal(19,0)) as c
       |  from daily_summary
       |)
       |$arms""".stripMargin
  }

  /** Mirror TimeMarts.revenueAnomalies: exact decimal trailing-window
    * moments (current row excluded), the string-routed stddevFromSums
    * recipe, identical IEEE 2σ comparison. */
  val revenueAnomaliesQ: String = {
    import graft.marts.TimeMarts.{AnomalyWindow, AnomalyMinDays, AnomalySigma}
    s"""$allCtes,
       |anom_base as (
       |  select order_date, daily_revenue,
       |    count(daily_revenue) over w as n_base,
       |    sum(daily_revenue) over w as sum_base,
       |    -- widen BEFORE the square: DuckDB multiplies width-18
       |    -- operands in int64 and overflows at sf0.1 revenue
       |    -- magnitudes; (19,2)×(19,2) forces int128 and is exact
       |    -- (Spark's (18,2)×(18,2) already widens to (37,4))
       |    sum(cast(daily_revenue as decimal(19,2))
       |        * cast(daily_revenue as decimal(19,2))) over w as sumsq_base
       |  from daily_summary
       |  window w as (order by order_date
       |               rows between $AnomalyWindow preceding and 1 preceding)
       |),
       |anom_m as (
       |  select *,
       |    cast(cast(sum_base as varchar) as double) / cast(n_base as double) as mean,
       |    case when n_base > 1 then sqrt(
       |      (cast(cast(sumsq_base as varchar) as double)
       |        - cast(cast(sum_base as varchar) as double)
       |          * cast(cast(sum_base as varchar) as double) / cast(n_base as double))
       |      / (cast(n_base as double) - 1.0)) end as std
       |  from anom_base
       |)
       |select order_date,
       |  cast(daily_revenue as double) as daily_revenue,
       |  cast(n_base as bigint) as n_base,
       |  case when n_base >= $AnomalyMinDays then mean end as baseline_mean,
       |  case when n_base >= $AnomalyMinDays then std end as baseline_std,
       |  case when n_base >= $AnomalyMinDays and std is not null
       |    then abs(cast(cast(daily_revenue as varchar) as double) - mean)
       |         > $AnomalySigma * std end as is_anomaly
       |from anom_m""".stripMargin
  }

  /** Mirror of TimeMarts.dailyMovingStats: same rows frame over the
    * daily summary, decimal running sums, one double division. */
  val dailyMovingStatsQ: String =
    s"""$allCtes ,
       |mv as (
       |  select order_date,
       |    sum(daily_revenue) over (order by order_date
       |      rows between 6 preceding and current row) as rev_7d,
       |    count(*) over (order by order_date
       |      rows between 6 preceding and current row) as n_days_7d
       |  from daily_summary
       |)
       |select order_date, cast(rev_7d as double) as revenue_7d, n_days_7d,
       |  cast(rev_7d as double) / cast(n_days_7d as double) as avg_daily_revenue_7d
       |from mv""".stripMargin

  val seasonalTrendsQ = s"$allCtes select * from seasonal_trends"
  val growthMetricsQ = s"$allCtes select * from growth_metrics"
  val timeAnalyticsQ = s"$allCtes select * from time_analytics"
  val customerSegmentationQ = s"$allCtes select * from customer_segmentation"

  /** Mirror TimeMarts.dailyGapfill: spine ⟕ daily, last_value ignore
    * nulls over the same growing frame, decimal→double at the
    * boundary. */
  val dailyGapfillQ: String =
    s"""$allCtes,
       |gf as (
       |  select ts.date_day, d.order_date, d.daily_revenue
       |  from time_spine ts
       |  left join daily_summary d on ts.date_day = d.order_date
       |)
       |select date_day,
       |  cast(daily_revenue as double) as daily_revenue,
       |  cast(last_value(daily_revenue ignore nulls) over (
       |    order by date_day rows between unbounded preceding and current row)
       |    as double) as revenue_filled,
       |  order_date is not null as is_observed
       |from gf""".stripMargin

  /** Mirror llm.Redaction.kAnonymityAudit over the segmentation mart:
    * generated from the SAME quasi-id list and k. */
  val kAnonymityAuditQ: String = {
    import graft.llm.Redaction.{KAnonymity, QuasiIds}
    val qids = QuasiIds.mkString(", ")
    s"""$allCtes,
       |ka_groups as (
       |  select $qids, count(*) as n from customer_segmentation group by ${
        QuasiIds.indices.map(_ + 1).mkString(", ")}
       |)
       |select cast($KAnonymity as bigint) as k,
       |  cast(count(*) as bigint) as n_groups,
       |  cast(count(case when n < $KAnonymity then 1 end) as bigint) as n_risky_groups,
       |  cast(coalesce(sum(case when n < $KAnonymity then n end), 0) as bigint) as n_risky_rows,
       |  cast(min(n) as bigint) as min_group_size
       |from ka_groups""".stripMargin
  }

  /** Mirror Redaction.lDiversityAudit: distinct sensitive values per
    * quasi-identifier group, one-row rollup (k-anonymity's homogeneity
    * companion). */
  val lDiversityAuditQ: String = {
    import graft.llm.Redaction.{LDiversity, QuasiIds, SensitiveAttr}
    val qids = QuasiIds.mkString(", ")
    s"""$allCtes,
       |ld_groups as (
       |  select $qids, count(*) as n,
       |    count(distinct $SensitiveAttr) as ndv
       |  from customer_segmentation group by ${
        QuasiIds.indices.map(_ + 1).mkString(", ")}
       |)
       |select cast($LDiversity as bigint) as l,
       |  cast(count(*) as bigint) as n_groups,
       |  cast(count(case when ndv < $LDiversity then 1 end) as bigint) as n_risky_groups,
       |  cast(coalesce(sum(case when ndv < $LDiversity then n end), 0) as bigint) as n_risky_rows,
       |  cast(min(ndv) as bigint) as min_distinct_sensitive
       |from ld_groups""".stripMargin
  }

  /** Mirror Redaction.tClosenessAudit: per-group total variation
    * distance of the sensitive distribution vs global, exact-integer
    * numerators (|c_gv·N − c_v·n_g|, absent values in closed form),
    * ONE division per group — generated from the same quasi-id list,
    * sensitive attribute, and t. Window/group sums are cast back to
    * bigint (DuckDB widens bigint sums to HUGEINT). */
  val tClosenessAuditQ: String = {
    import graft.llm.Redaction.{QuasiIds, SensitiveAttr, TCloseness}
    val qids = QuasiIds.mkString(", ")
    val nq = QuasiIds.size
    s"""$allCtes,
       |tc_obs as (
       |  select $qids, $SensitiveAttr from customer_segmentation
       |  where $SensitiveAttr is not null
       |),
       |tc_cell as (
       |  select $qids, $SensitiveAttr, count(*) as c_gv
       |  from tc_obs group by ${(1 to nq + 1).mkString(", ")}
       |),
       |tc_global as (
       |  select $SensitiveAttr, count(*) as c_v from tc_obs group by 1
       |),
       |tc_total as (select count(*) as n_total from tc_obs),
       |tc_ng as (
       |  select c.*, g.c_v, t.n_total,
       |    cast(sum(c_gv) over (partition by $qids) as bigint) as n_g
       |  from tc_cell c join tc_global g using ($SensitiveAttr)
       |  cross join tc_total t
       |),
       |tc_group as (
       |  select $qids, max(n_g) as n_g, max(n_total) as n_total,
       |    cast(sum(abs(c_gv * n_total - c_v * n_g)) as bigint) as num_in,
       |    cast(sum(c_v) as bigint) as covered_cv
       |  from tc_ng group by ${(1 to nq).mkString(", ")}
       |),
       |tc_tvd as (
       |  select n_g,
       |    cast(num_in + n_g * (n_total - covered_cv) as double)
       |      / cast(2 * n_g * n_total as double) as tvd
       |  from tc_group
       |)
       |select cast($TCloseness as double) as t,
       |  cast(count(*) as bigint) as n_groups,
       |  cast(count(case when tvd > $TCloseness then 1 end) as bigint) as n_risky_groups,
       |  cast(coalesce(sum(case when tvd > $TCloseness then n_g end), 0) as bigint) as n_risky_rows,
       |  max(tvd) as max_tvd
       |from tc_tvd""".stripMargin
  }

  /** Mirror testing.DqSummary.summary: the same rule lists rendered to
    * DuckDB SQL over the oracle CTEs (marts carry `_mart` suffixes
    * where the plain name is taken by an intermediate CTE). */
  val dqSummaryQ: String = {
    val cteName: String => String = {
      case "orders" => "orders_mart"
      case "customers" => "customers_mart"
      case "products" => "products_mart"
      case "locations" => "locations_mart"
      case "supplies" => "supplies_mart"
      case other => other
    }
    s"$allCtes ${graft.testing.DqSummary.oracleSelects(cteName)}"
  }
}
