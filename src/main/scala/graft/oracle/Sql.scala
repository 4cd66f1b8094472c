package graft.oracle

/** DuckDB oracle SQL mirroring each model exactly (driver contract:
  * Verify dumps these to oracle_sql.json; driver hash-compares).
  *
  * Determinism rules shared with the Scala side (see Funcs scaladoc):
  * decimal money, count(case...) instead of sum(case...) (DuckDB sums
  * ints to HUGEINT), single-division doubles, tiebroken windows.
  */
object Sql {

  val runDate = "DATE '2001-12-31'"

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
      |    coalesce(cast(l_linenumber as varchar), '_dbt_utils_surrogate_key_null_'))) as order_item_id,
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
      |  coalesce(p_type = 'PROMO', false) as is_promo_item,
      |  coalesce(p_type = 'ECONOMY', false) as is_economy_item
      |from part""".stripMargin

  val stgLocations: String =
    """select n_nationkey as location_id, n_name as location_name,
      |  r_name as region_name,
      |  cast(n_nationkey % 5 as double) / 100.0 + 0.04 as tax_rate,
      |  cast(DATE '1995-01-01' + (n_nationkey * 30) as date) as opened_at
      |from nation left join region on n_regionkey = r_regionkey""".stripMargin

  val stgSupplies: String =
    """select
      |  md5(concat_ws('-',
      |    coalesce(cast(s_suppkey as varchar), '_dbt_utils_surrogate_key_null_'),
      |    coalesce(cast(s_name as varchar), '_dbt_utils_surrogate_key_null_'))) as supply_uuid,
      |  s_suppkey as supply_id, s_name as supply_name,
      |  s_nationkey as location_id,
      |  cast(abs(s_acctbal) as decimal(18,2)) as supply_cost,
      |  s_suppkey % 2 = 1 as is_perishable_supply
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

  val customersBody: String =
    """select c.customer_id, c.customer_name, c.location_id,
      |  c.account_balance, c.market_segment,
      |  coalesce(s.count_lifetime_orders, 0) as count_lifetime_orders,
      |  s.first_ordered_at, s.last_ordered_at,
      |  cast(coalesce(s.lifetime_spend_pretax, 0) as decimal(18,2)) as lifetime_spend_pretax,
      |  cast(coalesce(s.lifetime_tax_paid, 0) as decimal(18,2)) as lifetime_tax_paid,
      |  cast(coalesce(s.lifetime_spend, 0) as decimal(18,2)) as lifetime_spend,
      |  cast(coalesce(s.lifetime_cost, 0) as decimal(18,2)) as lifetime_cost,
      |  case when coalesce(s.count_lifetime_orders, 0) > 1 then 'returning'
      |       else 'new' end as customer_type
      |from stg_customers c
      |left join (
      |  select customer_id,
      |    count(distinct order_id) as count_lifetime_orders,
      |    min(ordered_at) as first_ordered_at,
      |    max(ordered_at) as last_ordered_at,
      |    cast(sum(subtotal) as decimal(18,2)) as lifetime_spend_pretax,
      |    cast(sum(tax_paid) as decimal(18,2)) as lifetime_tax_paid,
      |    cast(sum(order_total) as decimal(18,2)) as lifetime_spend,
      |    cast(sum(order_cost) as decimal(18,2)) as lifetime_cost
      |  from orders_mart group by 1
      |) s using (customer_id)""".stripMargin

  /** Mart-level WITH prefix: staging + the three core marts. */
  val coreCtes: String =
    s"""$stagingCtes,
       |order_items as ($orderItemsBody),
       |orders_mart as ($ordersBody),
       |customers_mart as ($customersBody)""".stripMargin

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
}
