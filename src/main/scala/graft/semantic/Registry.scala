package graft.semantic

import graft.semantic.Spec._

/** The reference's semantic models, metrics, and all 8 saved queries
  * (reference `models/marts yml files`), adapted to this engine's schema
  * (promo/returned stand in for food/drink, money thresholds scaled —
  * same adaptations as the marts themselves).
  */
class Registry {

  val models: Map[String, SemanticModel] = Map(
    // reference orders.yml:54-97 (dimensions :70-84, food/drink →
    // promo/returned as everywhere in this adaptation)
    "orders" -> SemanticModel("orders", Some("ordered_at"),
      Map("order" -> "order_id", "location" -> "location_id", "customer" -> "customer_id"),
      Seq(
        Measure("order_total", Sum),
        Measure("order_count", Sum, Some("1")),
        Measure("tax_paid", Sum),
        Measure("order_cost", Sum)),
      dimensions = Map(
        "order_total_dim" -> "order_total",
        "is_promo_order" -> "is_promo_order",
        "has_returned_item" -> "has_returned_item",
        "customer_order_number" -> "customer_order_number")),
    // reference order_items.yml:43-86 (dimensions :60-69)
    "order_items" -> SemanticModel("order_items", Some("ordered_at"),
      Map("order_item" -> "order_item_id", "order" -> "order_id", "product" -> "product_id"),
      Seq(
        Measure("revenue", Sum, Some("product_price")),
        Measure("promo_revenue", Sum, Some("case when is_promo_item then product_price else 0 end")),
        Measure("economy_revenue", Sum, Some("case when is_economy_item then product_price else 0 end")),
        Measure("median_revenue", Median, Some("product_price")),
        // MetricFlow `agg: percentile, agg_params: {percentile: 0.9}` —
        // the one declared-in-spec agg type no reference measure uses
        Measure("p90_revenue", Percentile(0.9), Some("product_price")),
        Measure("supply_cost", Sum)),
      dimensions = Map(
        "is_promo_item" -> "is_promo_item",
        "is_economy_item" -> "is_economy_item")),
    // reference customers.yml:35-72 (dimensions :46-58)
    "customers" -> SemanticModel("customers", Some("first_ordered_at"),
      Map("customer" -> "customer_id"),
      Seq(
        Measure("customers", CountDistinct, Some("customer_id")),
        Measure("count_lifetime_orders", Sum),
        Measure("lifetime_spend_pretax", Sum),
        Measure("lifetime_spend", Sum)),
      dimensions = Map(
        "customer_name" -> "customer_name",
        "customer_type" -> "customer_type")),
    // reference products.yml:39-84
    "products" -> SemanticModel("products", None,
      Map("product" -> "product_id"),
      Seq(
        Measure("products", CountDistinct, Some("product_id")),
        Measure("total_revenue", Sum),
        Measure("total_profit", Sum),
        Measure("total_quantity_sold", Sum),
        Measure("avg_profit_margin", Avg, Some("profit_margin_ratio"))),
      // reference products.yml:48-64
      dimensions = Map(
        "product_name" -> "product_name",
        "product_type" -> "product_type",
        "performance_tier" -> "performance_tier"),
      bounded = true),   // catalog grain: does not grow with fact volume
    // reference locations.yml:35-84
    "locations" -> SemanticModel("locations", None,
      Map("location" -> "location_id"),
      Seq(
        Measure("locations", CountDistinct, Some("location_id")),
        Measure("total_revenue", Sum),
        Measure("total_profit", Sum),
        Measure("total_orders", Sum),
        Measure("avg_order_value", Avg),
        Measure("avg_customer_retention_rate", Avg, Some("customer_retention_rate")),
        Measure("average_tax_rate", Avg, Some("tax_rate"))),
      // reference locations.yml:46-59
      dimensions = Map(
        "location_name" -> "location_name",
        "performance_tier" -> "performance_tier",
        "retention_tier" -> "retention_tier"),
      bounded = true),   // store/location grain: bounded venue list
    // reference supplies.yml:41-90
    "supplies" -> SemanticModel("supplies", None,
      Map("supply" -> "supply_id"),
      Seq(
        Measure("supplies", CountDistinct, Some("supply_id")),
        Measure("total_supply_cost", Sum, Some("total_supply_cost_incurred")),
        Measure("total_revenue_generated", Sum, Some("revenue_generated")),
        Measure("avg_revenue_to_cost_ratio", Avg, Some("revenue_to_cost_ratio")),
        Measure("avg_inventory_turnover", Avg, Some("inventory_turnover_ratio"))),
      // reference supplies.yml:53-68
      dimensions = Map(
        "supply_name" -> "supply_name",
        "is_perishable_supply" -> "is_perishable_supply",
        "usage_tier" -> "usage_tier",
        "efficiency_tier" -> "efficiency_tier",
        "risk_category" -> "risk_category"),
      bounded = true),   // supplier-catalog grain: bounded
    // reference customer_segmentation.yml:35-87
    "customer_segmentation" -> SemanticModel("customer_segmentation", Some("first_ordered_at"),
      Map("customer" -> "customer_id"),
      Seq(
        Measure("customers", CountDistinct, Some("customer_id")),
        Measure("avg_rfm_score", Avg, Some("rfm_score")),
        Measure("avg_lifetime_spend", Avg, Some("lifetime_spend")),
        Measure("avg_lifetime_orders", Avg, Some("count_lifetime_orders"))),
      // reference customer_segmentation.yml:47-70
      dimensions = Map(
        "customer_type" -> "customer_type",
        "rfm_segment" -> "rfm_segment",
        "clv_tier" -> "clv_tier",
        "product_preference" -> "product_preference",
        "variety_preference" -> "variety_preference",
        "churn_risk" -> "churn_risk",
        "retention_action" -> "retention_action")),
    // reference time_analytics.yml:33-81
    "time_analytics" -> SemanticModel("time_analytics", Some("date_day"),
      Map("date" -> "date_day"),
      Seq(
        Measure("daily_orders", Sum),
        // daily money presents as double but is exact at 2 decimals;
        // re-cast to decimal so the SUM is order-independent (a double
        // sum would drift between engines' partition orders).
        Measure("daily_revenue", Sum, Some("cast(daily_revenue as decimal(18,2))")),
        Measure("daily_profit", Sum, Some("cast(daily_profit as decimal(18,2))")),
        Measure("daily_unique_customers", Sum),
        Measure("avg_daily_order_value", Avg, Some("daily_avg_order_value"))),
      bounded = true))   // calendar grain: grows with time, not volume

  /** entity name → the semantic model that declares it as PRIMARY —
    * how MetricFlow resolves `entity__dimension` group-bys: a fact
    * model's FOREIGN entity (e.g. `customer` on orders, reference
    * orders.yml:67-69) names the key; the owner model contributes the
    * dimension through a 1:1 join on its primary key. */
  val entityOwner: Map[String, String] = Map(
    "order" -> "orders",
    "order_item" -> "order_items",
    "customer" -> "customers",
    "product" -> "products",
    "location" -> "locations",
    "supply" -> "supplies")

  /** Resolve a Dimension name against the declared entity graph
    * (MetricFlow's entity-path resolution): `e1__e2__…__dim` walks
    * hop-by-hop — each segment must be an entity DECLARED on the
    * current model, whose owner model hosts the next hop — and the
    * remaining suffix must be a dimension of the final owner. A name
    * declared in the model's own dimensions map is local (empty hop
    * list); anything else that fails to walk is an error at compile
    * time, not a silent null column. Returns (hops, dim) where each
    * hop is (entityName, ownerModel). */
  def resolveDim(start: SemanticModel, name: String): (Seq[(String, SemanticModel)], String) = {
    if (start.dimensions.contains(name)) return (Nil, name)
    val segs = name.split("__")
    val hops = Seq.newBuilder[(String, SemanticModel)]
    var cur = start
    var i = 0
    while (i < segs.length - 1 && cur.entities.contains(segs(i)) &&
        entityOwner.contains(segs(i))) {
      val owner = model(entityOwner(segs(i)))
      hops += ((segs(i), owner))
      cur = owner
      i += 1
    }
    val dim = segs.drop(i).mkString("__")
    require(i > 0, s"dimension $name: not local to ${start.name} and " +
      s"'${segs.head}' is not a declared entity")
    cur.dimension(dim)   // fails fast on an unknown final dimension
    (hops.result(), dim)
  }

  val metrics: Map[String, Seq[Metric]] = Map(
    // reference orders.yml:99-143 (food/drink → promo/returned; 20 → 2 000 000)
    "orders" -> Seq(
      Simple("order_total", "order_total"),
      Simple("new_customer_orders", "order_count", Some("customer_order_number = 1")),
      Simple("large_orders", "order_count", Some("order_total >= 2000000")),
      Simple("orders", "order_count"),
      Simple("promo_orders", "order_count", Some("is_promo_order = true")),
      Simple("returned_orders", "order_count", Some("has_returned_item = true")),
      // filter through the customer entity join (MetricFlow's
      // `where: Dimension('customer__customer_type') = …` shape):
      // slices orders revenue by a CUSTOMERS-model dimension without
      // grouping by it
      Simple("returning_customer_revenue", "order_total",
        Some("customer__customer_type = 'returning'"))),
    // reference order_items.yml:88-167 (M4 ratio, M5/M6 derived, M7 cumulative)
    "order_items" -> Seq(
      Simple("revenue", "revenue"),
      Simple("order_cost", "supply_cost"),
      Simple("median_revenue", "median_revenue"),
      Simple("p90_revenue", "p90_revenue"),
      // MULTI-HOP entity path inside a metric FILTER: slice item
      // revenue by a customers-model dimension reached through orders
      // without grouping by it (filters and group-bys share the same
      // resolveDim machinery)
      Simple("returning_item_revenue", "revenue",
        Some("order__customer__customer_type = 'returning'")),
      Simple("promo_revenue", "promo_revenue"),
      Simple("economy_revenue", "economy_revenue"),
      Ratio("promo_revenue_pct", "promo_revenue", "revenue"),
      Ratio("economy_revenue_pct", "economy_revenue", "revenue"),
      Derived("revenue_growth_mom",
        "(current_revenue - revenue_prev_month) * 100 / revenue_prev_month",
        Seq(MetricInput("revenue", Some("current_revenue")),
          MetricInput("revenue", Some("revenue_prev_month"), offsetMonths = 1))),
      Derived("order_gross_profit", "revenue - cost",
        Seq(MetricInput("revenue"), MetricInput("order_cost", Some("cost")))),
      Cumulative("cumulative_revenue", "revenue")),
    // reference customers.yml:74-95
    "customers" -> Seq(
      Simple("lifetime_spend_pretax", "lifetime_spend_pretax"),
      Simple("count_lifetime_orders", "count_lifetime_orders"),
      // guarded: zero-order customers exist at larger SFs, and ANSI
      // division by zero throws (Spark) / yields inf (DuckDB) — the
      // CASE keeps both engines at NULL.
      Derived("average_order_value",
        "case when count_lifetime_orders <> 0 then lifetime_spend_pretax / count_lifetime_orders end",
        Seq(MetricInput("count_lifetime_orders"), MetricInput("lifetime_spend_pretax")))),
    // reference products.yml:86-110
    "products" -> Seq(
      Simple("product_revenue", "total_revenue"),
      Simple("product_profit", "total_profit"),
      Simple("product_count", "products"),
      Simple("avg_profit_margin", "avg_profit_margin")),
    // reference locations.yml:86-110
    "locations" -> Seq(
      Simple("location_revenue", "total_revenue"),
      Simple("location_profit", "total_profit"),
      Simple("location_count", "locations"),
      Simple("avg_location_order_value", "avg_order_value")),
    // reference supplies.yml:92-116
    "supplies" -> Seq(
      Simple("supply_cost", "total_supply_cost"),
      Simple("supply_revenue", "total_revenue_generated"),
      Simple("supply_count", "supplies"),
      Simple("avg_supply_efficiency", "avg_revenue_to_cost_ratio")),
    // reference customer_segmentation.yml:89-115
    "customer_segmentation" -> Seq(
      Simple("customer_segments", "customers"),
      Simple("avg_customer_rfm_score", "avg_rfm_score"),
      Simple("avg_customer_lifetime_value", "avg_lifetime_spend"),
      Simple("high_value_customers", "customers", Some("clv_tier = 'High Value'"))),
    // reference time_analytics.yml:83-107
    "time_analytics" -> Seq(
      Simple("total_daily_orders", "daily_orders"),
      Simple("total_daily_revenue", "daily_revenue"),
      Simple("total_daily_profit", "daily_profit"),
      Simple("avg_daily_customers", "daily_unique_customers")))

  /** All 8 saved queries (M8; one per mart yml) + planner demos for the
    * metric types not covered by a reference saved query (M4/M6/M7 and
    * median). */
  val savedQueries: Seq[SavedQuery] = Seq(
    SavedQuery("order_metrics", "orders",
      Seq("orders", "new_customer_orders", "order_total", "promo_orders", "returned_orders"),
      Seq(ByTime("day"))),
    SavedQuery("revenue_metrics", "order_items",
      Seq("revenue", "promo_revenue", "economy_revenue"), Seq(ByTime("day"))),
    SavedQuery("customer_order_metrics", "customers",
      Seq("count_lifetime_orders", "lifetime_spend_pretax", "average_order_value"),
      Seq(ByEntity("customer"))),
    SavedQuery("product_performance_metrics", "products",
      Seq("product_revenue", "product_profit", "product_count", "avg_profit_margin"),
      Seq(ByEntity("product"))),
    SavedQuery("location_performance_metrics", "locations",
      Seq("location_revenue", "location_profit", "location_count", "avg_location_order_value"),
      Seq(ByEntity("location"))),
    SavedQuery("supply_chain_metrics", "supplies",
      Seq("supply_cost", "supply_revenue", "supply_count", "avg_supply_efficiency"),
      Seq(ByEntity("supply"))),
    SavedQuery("customer_segmentation_metrics", "customer_segmentation",
      Seq("customer_segments", "avg_customer_rfm_score", "avg_customer_lifetime_value",
        "high_value_customers"),
      Seq(ByEntity("customer"))),
    SavedQuery("time_analytics_metrics", "time_analytics",
      Seq("total_daily_orders", "total_daily_revenue", "total_daily_profit", "avg_daily_customers"),
      Seq(ByTime("month"))),
    // metric-type demos: M3 filter, M4 ratio, M2 median
    SavedQuery("metric_revenue_pct", "order_items",
      Seq("promo_revenue_pct", "economy_revenue_pct"), Seq(ByTime("day"))),
    SavedQuery("metric_median_revenue", "order_items",
      Seq("median_revenue"), Seq(ByTime("month"))),
    // M6 offset + M5 derived
    SavedQuery("metric_revenue_growth_mom", "order_items",
      Seq("revenue_growth_mom"), Seq(ByTime("month"))),
    SavedQuery("metric_order_gross_profit", "order_items",
      Seq("order_gross_profit"), Seq(ByTime("day"))),
    // M7 cumulative
    SavedQuery("metric_cumulative_revenue", "order_items",
      Seq("cumulative_revenue"), Seq(ByTime("day"))),
    SavedQuery("metric_large_orders", "orders",
      Seq("large_orders"), Seq(ByTime("month"))),
    // week grain (both engines truncate to Monday) — covers the one
    // planner grain no reference saved query exercises (VERDICT r2 #9)
    SavedQuery("metric_weekly_orders", "orders",
      Seq("orders", "order_total"), Seq(ByTime("week"))),
    // multi-dimension group-bys (MetricFlow's general shape): time ×
    // entity in one hash aggregation; the cumulative variant runs its
    // running total as a KEYED window partitioned by product.
    SavedQuery("metric_revenue_by_product_month", "order_items",
      Seq("revenue"), Seq(ByTime("month"), ByEntity("product"))),
    SavedQuery("metric_cumulative_revenue_by_product", "order_items",
      Seq("cumulative_revenue"), Seq(ByTime("month"), ByEntity("product"))),
    // MetricFlow ENTITY JOINS (the reason fact models declare foreign
    // entities — orders.yml:64-69, order_items.yml:54-59): group one
    // model's measures by ANOTHER model's dimension through the shared
    // entity. One broadcast 1:1 join on the dim model's primary key,
    // still one hash aggregation.
    SavedQuery("metric_revenue_by_customer_type", "orders",
      Seq("orders", "order_total"),
      Seq(ByDimension("customer__customer_type"))),
    SavedQuery("metric_monthly_revenue_by_customer_type", "orders",
      Seq("order_total"),
      Seq(ByTime("month"), ByDimension("customer__customer_type"))),
    SavedQuery("metric_revenue_by_product_type", "order_items",
      Seq("revenue", "promo_revenue"),
      Seq(ByDimension("product__product_type"))),
    // same-model categorical Dimension group-bys (declared on every
    // reference model, e.g. customer_segmentation.yml:47-70)
    SavedQuery("metric_segments_by_clv_tier", "customer_segmentation",
      Seq("customer_segments", "high_value_customers"),
      Seq(ByDimension("clv_tier"))),
    SavedQuery("metric_orders_by_promo", "orders",
      Seq("orders", "order_total"),
      Seq(ByDimension("is_promo_order"))),
    // metric FILTER through the entity join — the joined dim is
    // referenced only in the filter, never grouped
    SavedQuery("metric_returning_revenue_by_month", "orders",
      Seq("returning_customer_revenue", "order_total"),
      Seq(ByTime("month"))),
    // FOREIGN entity as the group-by KEY (Entity('location') on
    // orders — declared at orders.yml:64-66, exercised nowhere in the
    // reference's shipped queries)
    SavedQuery("metric_revenue_by_location", "orders",
      Seq("orders", "order_total"), Seq(ByEntity("location"))),
    // MULTI-HOP entity path (r18): order_items reaches customers
    // THROUGH orders — `order` declared at order_items.yml:54-56,
    // `customer` at orders.yml:64-66; MetricFlow resolves the chained
    // path `order__customer__customer_type`. Two 1:1 key joins, still
    // one fact scan and one hash-agg shuffle.
    SavedQuery("metric_item_revenue_by_customer_type", "order_items",
      Seq("revenue"),
      Seq(ByDimension("order__customer__customer_type"))),
    // cumulative metric KEYED by a categorical Dimension (r18): the
    // running total partitions by the dim exactly as it does by an
    // entity (ADVICE r17: the oracle's window must carry ByDimension
    // keys too — this query pins that path green)
    SavedQuery("metric_cumulative_revenue_by_promo", "order_items",
      Seq("cumulative_revenue"),
      Seq(ByTime("month"), ByDimension("is_promo_item"))),
    // percentile agg type (MetricFlow `agg: percentile`) — exact
    // interpolated p90, month grain
    SavedQuery("metric_p90_revenue", "order_items",
      Seq("p90_revenue"), Seq(ByTime("month"))),
    // multi-hop entity dim referenced ONLY in a metric filter
    SavedQuery("metric_returning_item_revenue", "order_items",
      Seq("returning_item_revenue", "revenue"), Seq(ByTime("month"))))

  /** Multi-model metric queries (r18): metrics from two semantic
    * models composed on metric_time — MetricFlow's cross-model query
    * shape. Each part keeps its single-scan plan; the aggregated
    * frames (one row per month) full-outer-join on the group key. */
  val multiQueries: Seq[MultiModelQuery] = Seq(
    MultiModelQuery("metric_multi_model_monthly", Seq(
      SavedQuery("mm_orders", "orders",
        Seq("orders", "order_total"), Seq(ByTime("month"))),
      SavedQuery("mm_items", "order_items",
        Seq("revenue"), Seq(ByTime("month"))))),
    // composed on a shared ENTITY key instead of metric_time: both
    // models declare `customer` as primary, so the group frames join
    // 1:1 per customer
    MultiModelQuery("metric_multi_model_customer", Seq(
      SavedQuery("mm_cust", "customers",
        Seq("lifetime_spend_pretax", "count_lifetime_orders"),
        Seq(ByEntity("customer"))),
      SavedQuery("mm_seg", "customer_segmentation",
        Seq("avg_customer_rfm_score"), Seq(ByEntity("customer"))))))

  def model(n: String): SemanticModel =
    models.getOrElse(n, sys.error(s"unknown semantic model $n"))

  def metric(modelName: String, n: String): Metric =
    metrics(modelName).find(_.name == n).getOrElse(sys.error(s"unknown metric $n"))

  def savedQuery(n: String): SavedQuery =
    savedQueries.find(_.name == n).getOrElse(sys.error(s"unknown saved query $n"))

  def multiQuery(n: String): MultiModelQuery =
    multiQueries.find(_.name == n).getOrElse(sys.error(s"unknown multi-model query $n"))
}

object Registry extends Registry
