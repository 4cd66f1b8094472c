package graft.marts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs._
import graft.operators.Ranks

/** Analytics marts: products / locations / supplies (SURVEY §2 A12-A18,
  * W2-W4, J8-J16; reference `models/marts/{products,locations,supplies}
  * .sql`). All money math is exact decimal internally; every ratio /
  * average is a single IEEE double op over exact inputs, mirrored
  * verbatim in the DuckDB oracle so both engines produce bit-identical
  * float64.
  *
  * Global ranks: products and supplies are backed by dims that grow
  * linearly with SF (TPC-H part = SF×200k rows), so their ranks use the
  * two-phase range-partitioned [[graft.operators.Ranks.globalRank]] over
  * a materialized core table (byte-identical to a global window, no
  * single-partition stage). Only the genuinely bounded dims (25
  * locations) keep the single-partition window form.
  */
object AnalyticsMarts {

  /** row_number with explicit nulls-last + unique tiebreak. ONLY for
    * dims bounded independent of data size (locations: 25 rows) — for
    * SF-scaling dims use Ranks.globalRank. */
  private def rank1(metric: Column, tiebreak: Column): Column =
    row_number().over(graft.operators.BoundedWindow.orderBy(metric.desc_nulls_last, tiebreak))

  /** products mart rank stage (reference `products.sql:61-64` W2 +
    * `:142-172` J10/tiers): four scalable global ranks over the
    * materialized core, then the final projection. Each rank pass is a
    * 2-column pruned scan of the core table.
    */
  def productsFinal(core: DataFrame): DataFrame = {
    val keys = Seq("product_id", "product_name", "product_type", "brand",
      "product_price", "is_promo_item", "is_economy_item")
    Ranks.withGlobalRanks(core, "product_id", Seq(
        "revenue_rank" -> col("total_revenue"),
        "popularity_rank" -> col("total_quantity_sold"),
        "profit_rank" -> col("total_profit"),
        "margin_rank" -> col("profit_margin_ratio")))
      .select(
        keys.map(col) ++ Seq(
          col("total_orders"), col("total_quantity_sold"), col("total_revenue"),
          col("total_supply_cost"), col("total_profit"), col("profit_margin_ratio"),
          col("avg_selling_price"), col("avg_supply_cost"),
          col("revenue_rank"), col("popularity_rank"), col("profit_rank"), col("margin_rank"),
          col("locations_sold_at"), col("best_location_revenue"), col("worst_location_revenue"),
          col("peak_quarter_revenue"), col("low_quarter_revenue"),
          col("avg_quarterly_revenue"), col("seasonality_index"),
          when(col("revenue_rank") <= 5, lit("Top Performer"))
            .when(col("revenue_rank") <= 10, lit("High Performer"))
            .when(col("revenue_rank") <= 20, lit("Medium Performer"))
            .otherwise(lit("Low Performer")).as("performance_tier")): _*)
  }

  /** products mart core (reference `products.sql:21-172` minus the rank
    * columns): A12 7-key perf rollup, A13 two-level seasonal/location
    * rollups, J8-J10, F6 backfills. Materialized (Mat barrier in Models)
    * so the rank passes in [[productsFinal]] read a pruned parquet scan.
    */
  def productsCore(stgProducts: DataFrame, orderItems: DataFrame, orders: DataFrame): DataFrame = {
    val oi = orderItems.select(
      col("product_id"), col("order_id"), col("order_item_id"),
      col("product_price").as("item_price"),
      col("supply_cost").as("item_supply_cost"),
      col("ordered_at"))

    // A12: product performance (reference `products.sql:21-54` groups
    // by 7 product attributes). The 6 non-key attributes are
    // functionally dependent on product_id, so we aggregate the FACT by
    // product_id alone — the shuffle carries an 8-byte key instead of
    // ~100 bytes of strings through the count-distinct Expand — and
    // join the dim attributes back afterwards. Values are identical
    // (the unchanged 7-key oracle proves it); counts backfill to 0 like
    // the reference's left-join groups.
    val keys = Seq("product_id", "product_name", "product_type", "brand",
      "product_price", "is_promo_item", "is_economy_item")
    val perItem = oi.groupBy("product_id")
      .agg(
        countDistinct(col("order_id")).as("total_orders_raw"),
        count(col("order_item_id")).as("total_quantity_raw"),
        dec18(sum(col("item_price"))).as("rev_d"),
        dec18(sum(col("item_supply_cost"))).as("cost_d"))
    val perf = stgProducts
      .join(perItem, Seq("product_id"), "left")
      .withColumn("total_orders", coalesce(col("total_orders_raw"), lit(0L)))
      .withColumn("total_quantity_sold", coalesce(col("total_quantity_raw"), lit(0L)))
      .select(
        keys.map(col) ++ Seq(
          col("total_orders"), col("total_quantity_sold"),
          col("rev_d").cast("double").as("total_revenue"),
          col("cost_d").cast("double").as("total_supply_cost"),
          (col("rev_d") - col("cost_d")).cast("double").as("total_profit"),
          when(col("cost_d") > 0,
            (col("rev_d") - col("cost_d")).cast("double") / col("cost_d").cast("double"))
            .as("profit_margin_ratio"),
          avgOf(col("rev_d"), col("total_quantity_sold")).as("avg_selling_price"),
          avgOf(col("cost_d"), col("total_quantity_sold")).as("avg_supply_cost")): _*)

    // A13 level 1: per (product, quarter, month) (reference `:70-82`).
    val seasonal = oi.groupBy(
        col("product_id"),
        quarter(col("ordered_at")).as("order_quarter"),
        month(col("ordered_at")).as("order_month"))
      .agg(count(col("order_item_id")).as("quarterly_quantity"),
        dec18(sum(col("item_price"))).as("quarterly_revenue"))

    // A13 level 2: per product over the quarterly rollup (`:118-138`).
    val seasonalSummary = seasonal.groupBy("product_id")
      .agg(
        max(col("quarterly_revenue")).as("mx"),
        min(col("quarterly_revenue")).as("mn"),
        sum(col("quarterly_revenue")).as("srev"),
        count(col("quarterly_revenue")).as("nq"))
      .select(
        col("product_id"),
        col("mx").cast("double").as("peak_quarter_revenue"),
        col("mn").cast("double").as("low_quarter_revenue"),
        avgOf(col("srev"), col("nq")).as("avg_quarterly_revenue"),
        when(col("mx") > 0, (col("mx") - col("mn")).cast("double") / col("mx").cast("double"))
          .otherwise(lit(0.0)).as("seasonality_index"))

    // J9 + A13: per (product, location) then per product (`:86-114`).
    val locAnalysis = oi
      .join(orders.select("order_id", "location_id"), Seq("order_id"), "left")
      .groupBy("product_id", "location_id")
      .agg(count(col("order_item_id")).as("location_quantity"),
        dec18(sum(col("item_price"))).as("location_revenue"))
    val locSummary = locAnalysis.groupBy("product_id")
      .agg(
        countDistinct(col("location_id")).as("locations_sold_at"),
        max(col("location_revenue")).cast("double").as("best_location_revenue"),
        min(col("location_revenue")).cast("double").as("worst_location_revenue"))

    // J10 core 3-way + F6 backfill (`:142-172`; ranks/tier added in
    // productsFinal over the materialized result).
    perf
      .join(locSummary, Seq("product_id"), "left")
      .join(seasonalSummary, Seq("product_id"), "left")
      .select(
        keys.map(col) ++ Seq(
          col("total_orders"), col("total_quantity_sold"), col("total_revenue"),
          col("total_supply_cost"), col("total_profit"), col("profit_margin_ratio"),
          col("avg_selling_price"), col("avg_supply_cost"),
          coalesce(col("locations_sold_at"), lit(0L)).as("locations_sold_at"),
          coalesce(col("best_location_revenue"), lit(0.0)).as("best_location_revenue"),
          coalesce(col("worst_location_revenue"), lit(0.0)).as("worst_location_revenue"),
          coalesce(col("peak_quarter_revenue"), lit(0.0)).as("peak_quarter_revenue"),
          coalesce(col("low_quarter_revenue"), lit(0.0)).as("low_quarter_revenue"),
          coalesce(col("avg_quarterly_revenue"), lit(0.0)).as("avg_quarterly_revenue"),
          coalesce(col("seasonality_index"), lit(0.0)).as("seasonality_index")): _*)
  }

  /** locations mart (reference `locations.sql:21-156`): A14 4-key perf,
    * W3 5 global ranks, A15 retention ratios, A16 stddev coefficient of
    * variation (exact sum-of-squares form), J11-J13.
    */
  def locations(stgLocations: DataFrame, orders: DataFrame, customers: DataFrame): DataFrame = {
    // A14: location performance over orders (reference `:21-57`).
    val keys = Seq("location_id", "location_name", "tax_rate", "opened_at")
    val perf = stgLocations
      .join(orders.select("location_id", "order_id", "customer_id", "order_total",
        "tax_paid", "order_cost", "is_promo_order", "has_returned_item",
        "customer_order_number"), Seq("location_id"), "left")
      .groupBy(keys.map(col): _*)
      .agg(
        countDistinct(col("order_id")).as("total_orders"),
        countDistinct(col("customer_id")).as("unique_customers"),
        dec18(sum(col("order_total"))).as("rev_d"),
        dec18(sum(col("tax_paid"))).as("tax_d"),
        dec18(sum(col("order_cost"))).as("cost_d"),
        count(col("order_id")).as("n_orders"),
        count(when(col("is_promo_order"), lit(1))).as("promo_orders"),
        count(when(col("has_returned_item"), lit(1))).as("returned_orders"),
        countDistinct(when(col("customer_order_number") === 1, col("customer_id"))).as("new_customers"),
        countDistinct(when(col("customer_order_number") > 1, col("customer_id"))).as("returning_customers"))
      .select(
        keys.map(col) ++ Seq(
          col("total_orders"), col("unique_customers"),
          col("rev_d").cast("double").as("total_revenue"),
          col("tax_d").cast("double").as("total_tax_collected"),
          col("cost_d").cast("double").as("total_supply_cost"),
          (col("rev_d") - col("cost_d")).cast("double").as("total_profit"),
          avgOf(col("rev_d"), col("n_orders")).as("avg_order_value"),
          avgOf(col("cost_d"), col("n_orders")).as("avg_order_cost"),
          when(col("cost_d") > 0,
            (col("rev_d") - col("cost_d")).cast("double") / col("cost_d").cast("double"))
            .as("profit_margin_ratio"),
          col("promo_orders"), col("returned_orders"),
          col("new_customers"), col("returning_customers")): _*)

    // W3: five global ranks (reference `:65-69`), location_id tiebreak.
    val ranked = perf
      .withColumn("revenue_rank", rank1(col("total_revenue"), col("location_id")))
      .withColumn("order_volume_rank", rank1(col("total_orders"), col("location_id")))
      .withColumn("customer_base_rank", rank1(col("unique_customers"), col("location_id")))
      .withColumn("aov_rank", rank1(col("avg_order_value"), col("location_id")))
      .withColumn("profitability_rank", rank1(col("profit_margin_ratio"), col("location_id")))

    // J12 + A15: customer behavior per location (reference `:75-98`).
    val behavior = orders.select("location_id", "customer_id")
      .join(customers.select("customer_id", "count_lifetime_orders",
        "lifetime_spend", "customer_type"), Seq("customer_id"), "left")
      .groupBy("location_id")
      .agg(
        sum(col("count_lifetime_orders")).as("slo"),
        count(col("count_lifetime_orders")).as("nlo"),
        dec18(sum(col("lifetime_spend"))).as("sspend"),
        count(col("lifetime_spend")).as("nspend"),
        countDistinct(when(col("customer_type") === "new", col("customer_id"))).as("new_customer_count"),
        countDistinct(when(col("customer_type") === "returning", col("customer_id"))).as("returning_customer_count"),
        countDistinct(col("customer_id")).as("ncust"))
      .select(
        col("location_id"),
        avgOf(col("slo"), col("nlo")).as("avg_customer_lifetime_orders"),
        avgOf(col("sspend"), col("nspend")).as("avg_customer_lifetime_value"),
        col("new_customer_count"), col("returning_customer_count"),
        when(col("ncust") > 0,
          col("returning_customer_count").cast("double") / col("ncust").cast("double"))
          .otherwise(lit(0.0)).as("customer_retention_rate"))

    // A16: stddev of per-order profit via exact decimal sums
    // (reference `:101-118`); see Funcs.stddevFromSums.
    val profit = (col("order_total") - col("order_cost"))
    val supplyChain = orders
      .groupBy("location_id")
      .agg(
        sum(profit).as("sx"),
        sum(profit * profit).as("sx2"),
        count(col("order_id")).as("n"))
      .select(
        col("location_id"),
        avgOf(col("sx"), col("n")).as("avg_profit_per_order"),
        stddevFromSums(col("sx"), col("sx2"), col("n")).as("profit_variance"),
        when(avgOf(col("sx"), col("n")) > 0,
          stddevFromSums(col("sx"), col("sx2"), col("n")) / avgOf(col("sx"), col("n")))
          .as("profit_coefficient_of_variation"))

    // J13 final + tiers (reference `:122-156`).
    ranked
      .join(behavior, Seq("location_id"), "left")
      .join(supplyChain, Seq("location_id"), "left")
      .select(
        keys.map(col) ++ Seq(
          col("total_orders"), col("unique_customers"), col("total_revenue"),
          col("total_tax_collected"), col("total_supply_cost"), col("total_profit"),
          col("avg_order_value"), col("avg_order_cost"), col("profit_margin_ratio"),
          col("promo_orders"), col("returned_orders"),
          col("new_customers"), col("returning_customers"),
          col("revenue_rank"), col("order_volume_rank"), col("customer_base_rank"),
          col("aov_rank"), col("profitability_rank"),
          coalesce(col("avg_customer_lifetime_orders"), lit(0.0)).as("avg_customer_lifetime_orders"),
          coalesce(col("avg_customer_lifetime_value"), lit(0.0)).as("avg_customer_lifetime_value"),
          coalesce(col("customer_retention_rate"), lit(0.0)).as("customer_retention_rate"),
          coalesce(col("avg_profit_per_order"), lit(0.0)).as("avg_profit_per_order"),
          coalesce(col("profit_variance"), lit(0.0)).as("profit_variance"),
          coalesce(col("profit_coefficient_of_variation"), lit(0.0)).as("profit_coefficient_of_variation"),
          when(col("revenue_rank") <= 2, lit("Top Performer"))
            .when(col("revenue_rank") <= 4, lit("High Performer"))
            .otherwise(lit("Standard Performer")).as("performance_tier"),
          when(coalesce(col("customer_retention_rate"), lit(0.0)) >= 0.7, lit("High Retention"))
            .when(coalesce(col("customer_retention_rate"), lit(0.0)) >= 0.5, lit("Medium Retention"))
            .otherwise(lit("Low Retention")).as("retention_tier")): _*)
  }

  /** supply_performance: A17 rollup over the J14 N:M fan-out join
    * (supplies: 2 cost rows per supplier × order_items per supplier —
    * reference `supplies.sql:21-55` joins supplies to order_items on
    * product_id with the same fan-out shape). Materialized (Mat barrier
    * in Models): it feeds the supplies mart's rank/turnover/variance
    * stages AND the supplier rollup, so each consumer is a pruned scan.
    */
  def supplyPerformance(stgSupplies: DataFrame, orderItems: DataFrame): DataFrame = {
    val oi = orderItems.select(
      col("supplier_id"), col("order_id"), col("order_item_id"),
      col("product_price").as("item_price"),
      col("supply_cost").as("item_supply_cost"))
    val keys = Seq("supply_uuid", "supply_id", "supply_name", "supply_component",
      "supply_cost", "is_perishable_supply")
    // The reference joins supplies⟕items on the shared key and
    // aggregates per supply row (J14 N:M fan-out). A supplier's item
    // metrics are identical across its component rows, so aggregate the
    // fact ONCE per supplier and join the (2-row) dim after — the 2×
    // fan-out never shuffles. Values are identical per supply row (the
    // unchanged fan-out oracle proves it); the A2 grain trap (sum ALL
    // component rows) still lives in the order_items rollup.
    val perSupplier = oi.groupBy(col("supplier_id"))
      .agg(
        countDistinct(col("order_id")).as("orders_raw"),
        count(col("order_item_id")).as("usage_raw"),
        dec18(sum(col("item_price"))).as("rev_d"),
        dec18(sum(col("item_supply_cost"))).as("cost_d"))
    stgSupplies
      .join(perSupplier, stgSupplies("supply_id") === perSupplier("supplier_id"), "left")
      .withColumn("orders_using_supply", coalesce(col("orders_raw"), lit(0L)))
      .withColumn("total_usage_quantity", coalesce(col("usage_raw"), lit(0L)))
      .select(
        keys.map(col) ++ Seq(
          col("orders_using_supply"), col("total_usage_quantity"),
          col("rev_d").cast("double").as("revenue_generated"),
          col("cost_d").cast("double").as("total_supply_cost_incurred"),
          when(col("cost_d") > 0, col("rev_d").cast("double") / col("cost_d").cast("double"))
            .as("revenue_to_cost_ratio"),
          avgOf(col("rev_d"), col("total_usage_quantity")).as("avg_product_selling_price"),
          // fallback-to-dim-value CASE (reference `supplies.sql:49-53`)
          when(col("total_usage_quantity") > 0,
            col("cost_d").cast("double") / col("total_usage_quantity").cast("double"))
            .otherwise(col("supply_cost").cast("double")).as("avg_cost_per_usage")): _*)
  }

  /** supplies mart (reference `supplies.sql:59-185`): W4 4 global ranks,
    * J15 1:1 joins on the full grain key (supply_uuid — the reference
    * joins on supply_id alone, which fans out N:M against its own
    * "one row per supply" contract; we honor the contract), J16 final,
    * turnover + cost-variance analyses, 3 tier CASEs.
    */
  def supplies(perf: DataFrame): DataFrame = {
    // W4: four scalable global ranks (supplies dim = supplier × 2 grows
    // with SF) over the materialized performance table.
    val ranked = Ranks.withGlobalRanks(perf, "supply_uuid", Seq(
      "usage_rank" -> col("total_usage_quantity"),
      "revenue_contribution_rank" -> col("revenue_generated"),
      "efficiency_rank" -> col("revenue_to_cost_ratio"),
      "cost_rank" -> col("total_supply_cost_incurred")))

    // inventory turnover (reference `supplies.sql:99-121`).
    val turnover = perf.select(
      col("supply_uuid"),
      when(col("supply_cost") > 0 && col("total_usage_quantity") > 0,
        col("total_supply_cost_incurred") / col("supply_cost").cast("double"))
        .otherwise(lit(0.0)).as("turnover_ratio"),
      when(col("total_usage_quantity") > 0,
        lit(365.0) / col("total_usage_quantity").cast("double")).as("days_between_usage"))

    // cost variance (reference `supplies.sql:124-146`).
    val variance = perf.select(
      col("supply_uuid"),
      col("supply_cost").cast("double").as("standard_cost"),
      col("avg_cost_per_usage").as("actual_avg_cost"),
      when(col("supply_cost") > 0,
        (col("avg_cost_per_usage") - col("supply_cost").cast("double")) / col("supply_cost").cast("double"))
        .otherwise(lit(0.0)).as("cost_variance_percentage"),
      abs(col("avg_cost_per_usage") - col("supply_cost").cast("double")).as("absolute_cost_variance"))

    val joined = ranked
      .join(turnover, Seq("supply_uuid"), "left")
      .join(variance, Seq("supply_uuid"), "left")

    joined.select(
      col("supply_uuid"), col("supply_id"), col("supply_name"), col("supply_component"),
      col("supply_cost").cast("double").as("supply_cost"), col("is_perishable_supply"),
      col("orders_using_supply"), col("total_usage_quantity"),
      col("revenue_generated"), col("total_supply_cost_incurred"),
      col("revenue_to_cost_ratio"), col("avg_product_selling_price"), col("avg_cost_per_usage"),
      col("usage_rank"), col("revenue_contribution_rank"), col("efficiency_rank"), col("cost_rank"),
      coalesce(col("turnover_ratio"), lit(0.0)).as("inventory_turnover_ratio"),
      coalesce(col("days_between_usage"), lit(0.0)).as("avg_days_between_usage"),
      coalesce(col("cost_variance_percentage"), lit(0.0)).as("cost_variance_percentage"),
      coalesce(col("absolute_cost_variance"), lit(0.0)).as("absolute_cost_variance"),
      when(col("usage_rank") <= 5, lit("High Usage"))
        .when(col("usage_rank") <= 15, lit("Medium Usage"))
        .otherwise(lit("Low Usage")).as("usage_tier"),
      when(col("efficiency_rank") <= 5, lit("High Efficiency"))
        .when(col("efficiency_rank") <= 15, lit("Medium Efficiency"))
        .otherwise(lit("Low Efficiency")).as("efficiency_tier"),
      when(col("is_perishable_supply") && coalesce(col("days_between_usage"), lit(0.0)) > 7,
        lit("Risk: Slow Moving Perishable"))
        .when(!col("is_perishable_supply") && coalesce(col("days_between_usage"), lit(0.0)) > 30,
          lit("Risk: Slow Moving"))
        .when(coalesce(col("cost_variance_percentage"), lit(0.0)) > 0.2,
          lit("Risk: High Cost Variance"))
        .otherwise(lit("Normal")).as("risk_category"))
  }

  /** A18 supplier rollup (reference `supplies.sql:72-94` supplier_analysis
    * — a CTE the reference computes but never joins into its final
    * select; registered here as its own driver-verified query).
    * Groups the per-supply-row performance up to the supplier name.
    */
  def supplierRollup(perf: DataFrame): DataFrame = {
    // perf IS stg_supplies left-joined to its usage aggregates (same
    // rows, same grain), so the rollup groups the materialized table
    // directly — the old stg_supplies re-join was a 1:1 identity.
    perf
      .groupBy("supply_name")
      .agg(
        countDistinct(col("supply_component")).as("components_supplied"),
        sum(col("supply_cost")).as("sc"),
        count(col("supply_cost")).as("nc"),
        sum(col("total_usage_quantity")).as("total_supplier_usage"),
        sum(col("revenue_generated")).as("srev"),
        sum(col("total_supply_cost_incurred")).as("scost"))
      .select(
        col("supply_name"), col("components_supplied"),
        avgOf(col("sc"), col("nc")).as("avg_supply_cost"),
        col("total_supplier_usage"),
        col("srev").as("total_supplier_revenue"),
        when(col("scost") > 0, col("srev") / col("scost")).as("supplier_efficiency_ratio"))
  }

  /** Top products per supplier via [[graft.expressions.TopKAggregate]]
    * — the GROUPED top-k done as a bounded-heap partial aggregate. */
  val TopProductsK = 3

  /** (supplier_id, product_rank, product_id, product_revenue): each
    * supplier's top-K products by summed discounted revenue. The heap
    * aggregate's partial pass keeps ≤ K entries per supplier per map
    * task BEFORE the exchange — the window form (`row_number over
    * (partition by supplier order by rev desc)`) would shuffle and
    * sort every (supplier, product) row instead. Revenue leaves exact
    * decimal as ONE double cast at the score boundary; ties break on
    * ascending product_id in both the heap and the oracle window. */
  def topProductsPerSupplier(orderItems: DataFrame): DataFrame = {
    val rev = orderItems
      .groupBy(col("supplier_id"), col("product_id"))
      .agg(sum(col("discounted_price")).as("rev_dec"))
      .select(col("supplier_id"), col("product_id"),
        col("rev_dec").cast("double").as("product_revenue"))
    rev.groupBy(col("supplier_id"))
      .agg(graft.expressions.TopKAggregate
        .top_k(col("product_revenue"), col("product_id"), TopProductsK).as("tk"))
      .select(col("supplier_id"), posexplode(col("tk")))
      .select(col("supplier_id"),
        (col("pos") + 1).cast("int").as("product_rank"),
        col("col.payload").as("product_id"),
        col("col.score").as("product_revenue"))
  }

  /** CUBE / grouping-sets rollup over the raw lineitem fact — the
    * multi-granularity aggregation surface (detail, each single-dim
    * rollup, grand total in ONE pass) a BI layer asks the engine for.
    * Spark plans `cube` as a single Expand + hash aggregate — the
    * grouping-set rows share one scan and one shuffle instead of
    * 4 unioned aggregates. Explicit `grouping()` flags disambiguate
    * "NULL because aggregated away" from a (hypothetical) NULL key at
    * the consumer, the classic grouping-sets contract.
    *
    * Determinism: quantities cast double→decimal(12,2) at the input
    * (the staging convention — TPC-H quantities are integral, the
    * cast is exact) so every sum is exact decimal; counts are longs;
    * no floats anywhere. */
  def lineitemCube(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(12, 2))
          .as("qty"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(dec18(sum(col("qty"))).as("sum_qty"),
        count(lit(1)).as("n_items"),
        grouping(col("l_returnflag")).cast("long").as("g_returnflag"),
        grouping(col("l_linestatus")).cast("long").as("g_linestatus"))
}
