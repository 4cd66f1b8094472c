package graft

import org.apache.spark.sql.functions._
import graft.semantic.{OracleGen, Registry}
import graft.semantic.Spec._

/** Specs for the metric planner (M1-M8). */
class SemanticSpec extends SparkSpec {

  test("M8: every saved query compiles and returns one row per group key") {
    Registry.savedQueries.foreach { q =>
      val df = Models.semanticQuery(q.name)(spark, sf)
      val gNames = q.groupBys.map(graft.semantic.Planner.nameOf)
      assert(df.columns.take(gNames.size).toSeq === gNames, q.name)
      assert(df.groupBy(gNames.map(col): _*).count()
        .filter(col("count") > 1).count() === 0, q.name)
      assert(df.count() > 0, q.name)
    }
    Registry.multiQueries.foreach { q =>
      val df = Models.semanticMultiQuery(q.name)(spark, sf)
      val gNames = q.parts.head.groupBys.map(graft.semantic.Planner.nameOf)
      assert(df.columns.take(gNames.size).toSeq === gNames, q.name)
      assert(df.groupBy(gNames.map(col): _*).count()
        .filter(col("count") > 1).count() === 0, q.name)
      assert(df.count() > 0, q.name)
    }
  }

  test("multi-hop entity dim in a metric FILTER slices without grouping by it") {
    val df = Models.semanticQuery("metric_returning_item_revenue")(spark, sf)
    assert(df.columns.toSeq ===
      Seq("metric_time", "returning_item_revenue", "revenue"))
    assert(df.filter(col("returning_item_revenue") > col("revenue")).count() === 0)
    // hand replication through the two-hop join
    val expected = Models.orderItems(spark, sf)
      .join(Models.orders(spark, sf).select("order_id", "customer_id"),
        Seq("order_id"), "left")
      .join(Models.customers(spark, sf).select("customer_id", "customer_type"),
        Seq("customer_id"), "left")
      .filter(col("customer_type") === "returning")
      .groupBy(date_trunc("month", col("ordered_at")).cast("date").as("metric_time"))
      .agg(sum(col("product_price")).cast("double").as("e"))
    val bad = df.join(expected, Seq("metric_time"), "left")
      .filter(coalesce(col("returning_item_revenue"), lit(0.0)) =!=
        coalesce(col("e"), lit(0.0))).count()
    assert(bad === 0)
  }

  test("multi-dimension group-by: time x entity totals reconcile") {
    val df = Models.semanticQuery("metric_revenue_by_product_month")(spark, sf)
    assert(df.columns.toSeq === Seq("metric_time", "product", "revenue"))
    // summing the per-product monthly revenue over products reproduces
    // the single-dim monthly revenue (both exact-decimal sums)
    val perMonth = df.groupBy("metric_time")
      .agg(sum(col("revenue").cast("decimal(18,2)")).as("r"))
    val oneDim = Models.semanticQuery("metric_median_revenue")(spark, sf) // month grain rows
    assert(perMonth.count() === oneDim.count())
    val monthly = Models.orderItems(spark, sf)
      .groupBy(date_trunc("month", col("ordered_at")).cast("date").as("metric_time"))
      .agg(sum(col("product_price")).cast("decimal(18,2)").as("expected"))
    val bad = perMonth.join(monthly, Seq("metric_time"))
      .filter(col("r") =!= col("expected")).count()
    assert(bad === 0)
  }

  test("multi-dimension cumulative: running total is keyed per product") {
    val df = Models.semanticQuery("metric_cumulative_revenue_by_product")(spark, sf)
    // within each product the cumulative is monotone over months
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("product").orderBy("metric_time")
    val bad = df.withColumn("prev", lag(col("cumulative_revenue"), 1).over(w))
      .filter(col("prev").isNotNull && col("cumulative_revenue") < col("prev")).count()
    assert(bad === 0)
  }

  test("M3: filtered metric <= unfiltered metric") {
    val df = Models.semanticQuery("order_metrics")(spark, sf)
    assert(df.filter(col("new_customer_orders") > col("orders")).count() === 0)
    assert(df.filter(col("promo_orders") > col("orders")).count() === 0)
  }

  test("M4: ratio metrics bounded by [0,1]") {
    val df = Models.semanticQuery("metric_revenue_pct")(spark, sf)
    assert(df.filter(col("promo_revenue_pct") < 0 || col("promo_revenue_pct") > 1).count() === 0)
  }

  test("M5: derived AOV = pretax / orders") {
    val df = Models.semanticQuery("customer_order_metrics")(spark, sf)
    val bad = df.filter(col("count_lifetime_orders") > 0 &&
      abs(col("average_order_value") -
        col("lifetime_spend_pretax") / col("count_lifetime_orders")) > 1e-9).count()
    assert(bad === 0)
  }

  test("M6: offset metric is null exactly on the first month") {
    val df = Models.semanticQuery("metric_revenue_growth_mom")(spark, sf).orderBy("metric_time")
    val rows = df.collect()
    assert(rows.head.isNullAt(1))
    assert(rows.tail.forall(!_.isNullAt(1)))
  }

  test("M7: cumulative metric is monotone and ends at the total") {
    val df = Models.semanticQuery("metric_cumulative_revenue")(spark, sf).orderBy("metric_time")
    val vals = df.select("cumulative_revenue").collect().map(_.getDouble(0))
    assert(vals.sliding(2).forall { case Array(a, b) => b >= a })
    val total = Models.orderItems(spark, sf)
      .agg(sum("product_price").cast("double")).head.getDouble(0)
    assert(math.abs(vals.last - total) < 1e-6)
  }

  test("entity join: orders revenue by customer__customer_type matches a hand join") {
    val df = Models.semanticQuery("metric_revenue_by_customer_type")(spark, sf)
    assert(df.columns.toSeq === Seq("customer__customer_type", "orders", "order_total"))
    // hand-computed: orders ⟕ customers on customer_id, grouped by the
    // customers mart's customer_type
    val expected = Models.orders(spark, sf).alias("o")
      .join(Models.customers(spark, sf).select(col("customer_id"),
        col("customer_type")).alias("c"), Seq("customer_id"), "left")
      .groupBy(col("customer_type").as("customer__customer_type"))
      .agg(count(lit(1)).as("e_orders"),
        sum(col("order_total")).cast("double").as("e_total"))
    val bad = df.join(expected, Seq("customer__customer_type"), "full")
      .filter(col("orders") =!= col("e_orders") ||
        abs(col("order_total") - col("e_total")) > 1e-6).count()
    assert(bad === 0)
    // the dim actually joined: every order's customer exists in the
    // customers mart, so no group key is null (sf0.001 may have only
    // one customer_type value — don't assert on cardinality)
    assert(df.filter(col("customer__customer_type").isNull).count() === 0)
    // plan shape: customers is FACT-SCALED (bounded=false) so the dim
    // side carries no forced hint — at this scale AQE/threshold logic
    // still picks broadcast on its own, which is exactly the contract:
    // broadcast while measurably small, shuffle when not
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("entity join scale gate: fact-scaled dim is NOT forced broadcast; bounded dim is") {
    // with every broadcast threshold disabled, only a planner-forced
    // hint can produce a broadcast join. customers (fact-scaled,
    // bounded=false) must compile to a non-broadcast join — the 100 TB
    // OOM path VERDICT r17 flagged is gone. products (bounded=true)
    // keeps the hint and still broadcasts.
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try {
      val factScaled = Models.semanticQuery("metric_revenue_by_customer_type")(spark, sf)
      factScaled.collect()
      val fsJoins = graft.tools.PlanMetrics.joinStrategiesOf(factScaled)
      assert(fsJoins.nonEmpty)
      assert(!fsJoins.contains("broadcast_hash"),
        s"fact-scaled dim must not be forced broadcast, got $fsJoins")
      val boundedDim = Models.semanticQuery("metric_revenue_by_product_type")(spark, sf)
      boundedDim.collect()
      val bJoins = graft.tools.PlanMetrics.joinStrategiesOf(boundedDim)
      assert(bJoins.contains("broadcast_hash"),
        s"bounded dim keeps the broadcast hint, got $bJoins")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("multi-hop entity path: order_items reaches customer_type through orders") {
    val df = Models.semanticQuery("metric_item_revenue_by_customer_type")(spark, sf)
    assert(df.columns.toSeq === Seq("order__customer__customer_type", "revenue"))
    // hand-computed two-hop join: order_items -> orders -> customers
    val expected = Models.orderItems(spark, sf)
      .join(Models.orders(spark, sf).select("order_id", "customer_id"),
        Seq("order_id"), "left")
      .join(Models.customers(spark, sf).select("customer_id", "customer_type"),
        Seq("customer_id"), "left")
      .groupBy(col("customer_type").as("order__customer__customer_type"))
      .agg(sum(col("product_price")).cast("double").as("e_revenue"))
    val bad = df.join(expected, Seq("order__customer__customer_type"), "full")
      .filter(abs(col("revenue") - col("e_revenue")) > 1e-6).count()
    assert(bad === 0)
    assert(df.filter(col("order__customer__customer_type").isNull).count() === 0)
  }

  test("multi-model query: per-part metrics equal their single-model twins") {
    val mm = Models.semanticMultiQuery("metric_multi_model_monthly")(spark, sf)
    assert(mm.columns.toSeq === Seq("metric_time", "orders", "order_total", "revenue"))
    // each part must match the standalone compilation of its model
    val lhs = mm.select("metric_time", "revenue")
    val rhs = graft.semantic.Planner.savedQuery(
      graft.semantic.Spec.SavedQuery("x", "order_items", Seq("revenue"),
        Seq(graft.semantic.Spec.ByTime("month"))),
      graft.semantic.Registry, Models.orderItems(spark, sf))
    val bad = lhs.join(rhs.withColumnRenamed("revenue", "e"), Seq("metric_time"), "full")
      .filter(coalesce(col("revenue"), lit(-1)) =!= coalesce(col("e"), lit(-1))).count()
    assert(bad === 0)
    // group keys coalesce across parts: no null metric_time
    assert(mm.filter(col("metric_time").isNull).count() === 0)
  }

  test("cumulative by categorical dimension: running total keyed by the dim") {
    val df = Models.semanticQuery("metric_cumulative_revenue_by_promo")(spark, sf)
    assert(df.columns.toSeq ===
      Seq("metric_time", "is_promo_item", "cumulative_revenue"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("is_promo_item").orderBy("metric_time")
    val bad = df.withColumn("prev", lag(col("cumulative_revenue"), 1).over(w))
      .filter(col("prev").isNotNull && col("cumulative_revenue") < col("prev")).count()
    assert(bad === 0)
  }

  test("percentile agg: p90 sits between median and max") {
    val df = Models.semanticQuery("metric_p90_revenue")(spark, sf)
    val med = Models.semanticQuery("metric_median_revenue")(spark, sf)
    val joined = df.join(med, Seq("metric_time"))
    assert(joined.filter(col("p90_revenue") < col("median_revenue")).count() === 0)
    val mx = Models.orderItems(spark, sf)
      .groupBy(date_trunc("month", col("ordered_at")).cast("date").as("metric_time"))
      .agg(max(col("product_price")).cast("double").as("mx"))
    assert(df.join(mx, Seq("metric_time"))
      .filter(col("p90_revenue") > col("mx")).count() === 0)
  }

  test("entityDimRefs ignores entity-like tokens inside string literals") {
    import graft.semantic.Spec
    val declared = Set("customer")
    // a literal mentioning customer__x must not trigger a join attempt
    assert(Spec.entityDimRefs("note = 'customer__x'", declared) === Seq.empty)
    assert(Spec.entityDimRefs(
      "customer__customer_type = 'returning'", declared) ===
      Seq("customer__customer_type"))
    // mixed: the literal is blanked, the real token survives
    assert(Spec.entityDimRefs(
      "customer__tier = 'customer__fake' and x = 1", declared) ===
      Seq("customer__tier"))
  }

  test("categorical dimension: segmentation counts by clv_tier reconcile") {
    val df = Models.semanticQuery("metric_segments_by_clv_tier")(spark, sf)
    assert(df.columns.toSeq ===
      Seq("clv_tier", "customer_segments", "high_value_customers"))
    // high_value_customers is nonzero ONLY in the High Value tier (the
    // metric's filter and the group-by read the same column)
    val offTier = df.filter(col("clv_tier") =!= "High Value" &&
      col("high_value_customers") > 0).count()
    assert(offTier === 0)
    // tier counts sum to the total customer count
    val total = df.agg(sum("customer_segments")).head.getLong(0)
    assert(total === Models.customerSegmentation(spark, sf).count())
  }

  test("entity-joined dim in a metric FILTER slices without grouping by it") {
    val df = Models.semanticQuery("metric_returning_revenue_by_month")(spark, sf)
    assert(df.columns.toSeq ===
      Seq("metric_time", "returning_customer_revenue", "order_total"))
    // filtered metric can never exceed the unfiltered one
    assert(df.filter(col("returning_customer_revenue") > col("order_total"))
      .count() === 0)
    // hand replication: orders ⟕ customers, filter on the customers
    // dim, month rollup
    val expected = Models.orders(spark, sf)
      .join(Models.customers(spark, sf)
        .select(col("customer_id"), col("customer_type")),
        Seq("customer_id"), "left")
      .filter(col("customer_type") === "returning")
      .groupBy(date_trunc("month", col("ordered_at")).cast("date").as("metric_time"))
      .agg(sum("order_total").cast("double").as("e"))
    val bad = df.join(expected, Seq("metric_time"), "left")
      .filter(coalesce(col("returning_customer_revenue"), lit(0.0)) =!=
        coalesce(col("e"), lit(0.0))).count()
    assert(bad === 0)
  }

  test("oracle generator emits SQL for every saved query") {
    Registry.savedQueries.foreach { q =>
      val sql = OracleGen.savedQuery(q, Registry, "")
      assert(sql.contains(q.name.takeRight(0) + "sq_base"), q.name)
      q.metrics.foreach(m => assert(sql.contains(m), s"${q.name}: $m"))
    }
  }

  test("spec registry is closed: every metric's measures resolve") {
    Registry.metrics.foreach { case (modelName, ms) =>
      val model = Registry.model(modelName)
      ms.foreach {
        case Simple(_, meas, _) => model.measure(meas)
        case Cumulative(_, meas) => model.measure(meas)
        case Ratio(n, a, b) =>
          assert(ms.exists(_.name == a) && ms.exists(_.name == b), n)
        case Derived(n, _, ins) =>
          ins.foreach(i => assert(ms.exists(_.name == i.metric), s"$n -> ${i.metric}"))
      }
    }
  }
}
