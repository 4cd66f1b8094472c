package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs._

/** customer_segmentation mart (SURVEY §2 A4-A5, J6-J7, P4, P6, F3/F5/F7;
  * reference `models/marts/customer_segmentation.sql:21-222`).
  *
  * Adaptations (documented divergences, consistent with the oracle):
  *  - RFM monetary / CLV thresholds rescaled from jaffle dollars to the
  *    TPC-H money scale (lifetime spend quintiles ≈ 1.7/2.2/2.7/3.3 M).
  *  - food/drink preference → promo/returned preference (the testdata's
  *    boolean pair); location-behavior thresholds fit 25 locations.
  *  - `mode() within group (order by product_name)` (A5) is rewritten
  *    deterministically: count per (customer, product) → row_number by
  *    (count desc, product_name asc) → keep rank 1 (SURVEY §7.4.5); the
  *    identical rewrite runs in DuckDB, so ties break the same way.
  */
object SegmentationMart {

  def customerSegmentation(customers: DataFrame, orders: DataFrame,
                           orderItems: DataFrame): DataFrame = {
    // rfm_analysis (reference `:21-64`): P4 null-rejection filter, F3
    // day datediff against the pinned clock (F5), three score CASEs.
    val days = datediff(runDate, col("last_ordered_at"))
    val rfm = customers
      .filter(col("customer_id").isNotNull)
      .select(
        col("customer_id"), col("customer_name"), col("customer_type"),
        col("count_lifetime_orders"), col("lifetime_spend"),
        col("first_ordered_at"), col("last_ordered_at"),
        days.as("days_since_last_order"),
        col("count_lifetime_orders").as("frequency_score"),
        col("lifetime_spend").as("monetary_score"),
        when(days <= 30, 5).when(days <= 60, 4).when(days <= 90, 3)
          .when(days <= 180, 2).otherwise(1).as("recency_score"),
        when(col("count_lifetime_orders") >= 13, 5)
          .when(col("count_lifetime_orders") >= 11, 4)
          .when(col("count_lifetime_orders") >= 9, 3)
          .when(col("count_lifetime_orders") >= 7, 2)
          .otherwise(1).as("frequency_quintile"),
        when(col("lifetime_spend") >= 3300000, 5)
          .when(col("lifetime_spend") >= 2700000, 4)
          .when(col("lifetime_spend") >= 2200000, 3)
          .when(col("lifetime_spend") >= 1700000, 2)
          .otherwise(1).as("monetary_quintile"))

    // rfm_segments (reference `:66-108`): 11-arm segment CASE + score.
    val r = col("recency_score"); val f = col("frequency_quintile"); val m = col("monetary_quintile")
    val segments = rfm
      .withColumn("rfm_score",
        (r + f + m).cast("double") / lit(3.0))
      .withColumn("rfm_segment",
        when(r >= 4 && f >= 4 && m >= 4, "Champions")
          .when(r >= 3 && f >= 3 && m >= 3, "Loyal Customers")
          .when(r >= 4 && f <= 2 && m >= 3, "Potential Loyalists")
          .when(r >= 4 && f <= 2 && m <= 2, "New Customers")
          .when(r >= 3 && f >= 2 && m <= 2, "Promising")
          .when(r <= 2 && f >= 3 && m >= 3, "Need Attention")
          .when(r <= 2 && f >= 2 && m >= 2, "About to Sleep")
          .when(r <= 2 && f >= 4 && m <= 2, "At Risk")
          .when(r <= 1 && f >= 4 && m >= 4, "Cannot Lose Them")
          .when(r <= 2 && f <= 2 && m >= 3, "Hibernating")
          .otherwise("Lost"))

    // customer_lifetime_value (reference `:110-132`), TPC-H-scaled tiers.
    val clv = rfm.select(
      col("customer_id"),
      when(col("lifetime_spend") >= 3500000, "High Value")
        .when(col("lifetime_spend") >= 2500000, "Medium Value")
        .when(col("lifetime_spend") >= 1500000, "Low Value")
        .otherwise("Minimal Value").as("clv_tier"),
      when(col("count_lifetime_orders") >= 12, "Very Frequent")
        .when(col("count_lifetime_orders") >= 9, "Frequent")
        .when(col("count_lifetime_orders") >= 6, "Occasional")
        .otherwise("Rare").as("purchase_frequency_tier"))

    // behavioral_segments (reference `:134-160`): A4 conditional aggs.
    val promoN = count(when(col("is_promo_order"), lit(1)))
    val returnedN = count(when(col("has_returned_item"), lit(1)))
    val behavioral = orders.groupBy("customer_id")
      .agg(
        promoN.as("promo_orders"),
        returnedN.as("returned_orders"),
        countDistinct(col("location_id")).as("locations_visited"))
      .select(
        col("customer_id"), col("promo_orders"), col("returned_orders"),
        col("locations_visited"),
        when(col("promo_orders") > col("returned_orders"), "Promo Focused")
          .when(col("returned_orders") > col("promo_orders"), "Return Heavy")
          .otherwise("Balanced").as("product_preference"),
        when(col("locations_visited") >= 9, "Multi-Location")
          .when(col("locations_visited") >= 7, "Two-Location")
          .otherwise("Single-Location").as("location_behavior"))

    // product_preferences (reference `:162-182`): J7 customer
    // attribution + A5 deterministic mode rewrite.
    val itemsByCustomer = orderItems.select("order_id", "product_id", "product_name")
      .join(orders.select("order_id", "customer_id"), Seq("order_id"), "left")
    val favorite = itemsByCustomer
      .groupBy("customer_id", "product_name")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("customer_id").orderBy(col("cnt").desc, col("product_name"))))
      .filter(col("rn") === 1)
      .select(col("customer_id"), col("product_name").as("favorite_product"))
    val prefs = itemsByCustomer
      .groupBy("customer_id")
      .agg(countDistinct(col("product_id")).as("unique_products_purchased"))
      .join(favorite, Seq("customer_id"), "left")
      .select(
        col("customer_id"), col("unique_products_purchased"), col("favorite_product"),
        when(col("unique_products_purchased") >= 30, "Variety Seeker")
          .when(col("unique_products_purchased") >= 15, "Moderate Variety")
          .otherwise("Consistent Buyer").as("variety_preference"))

    // churn_prediction (reference `:184-204`): P6 IN-list predicate.
    val churn = segments.select(
      col("customer_id"),
      when(col("days_since_last_order") > 180, "High Risk")
        .when(col("days_since_last_order") > 90, "Medium Risk")
        .when(col("days_since_last_order") > 60, "Low Risk")
        .otherwise("Active").as("churn_risk"),
      when(col("rfm_segment").isin("Lost", "Hibernating", "Cannot Lose Them"), "Immediate Action")
        .when(col("rfm_segment").isin("At Risk", "About to Sleep", "Need Attention"), "Monitor Closely")
        .otherwise("Maintain").as("retention_action"))

    // final (reference `:206-222`): J6 4-way left-join chain + backfill.
    segments
      .join(clv, Seq("customer_id"), "left")
      .join(behavioral, Seq("customer_id"), "left")
      .join(prefs, Seq("customer_id"), "left")
      .join(churn, Seq("customer_id"), "left")
      .select(
        col("customer_id"), col("customer_name"), col("customer_type"),
        col("count_lifetime_orders"), col("lifetime_spend").cast("double").as("lifetime_spend"),
        col("first_ordered_at"), col("last_ordered_at"),
        col("days_since_last_order"),
        col("frequency_score"), col("monetary_score").cast("double").as("monetary_score"),
        col("recency_score"), col("frequency_quintile"), col("monetary_quintile"),
        col("rfm_score"), col("rfm_segment"),
        coalesce(col("clv_tier"), lit("Unknown")).as("clv_tier"),
        coalesce(col("purchase_frequency_tier"), lit("Unknown")).as("purchase_frequency_tier"),
        coalesce(col("promo_orders"), lit(0L)).as("promo_orders"),
        coalesce(col("returned_orders"), lit(0L)).as("returned_orders"),
        coalesce(col("locations_visited"), lit(0L)).as("locations_visited"),
        coalesce(col("product_preference"), lit("Unknown")).as("product_preference"),
        coalesce(col("location_behavior"), lit("Unknown")).as("location_behavior"),
        coalesce(col("unique_products_purchased"), lit(0L)).as("unique_products_purchased"),
        coalesce(col("favorite_product"), lit("Unknown")).as("favorite_product"),
        coalesce(col("variety_preference"), lit("Unknown")).as("variety_preference"),
        coalesce(col("churn_risk"), lit("Unknown")).as("churn_risk"),
        coalesce(col("retention_action"), lit("Unknown")).as("retention_action"))
  }
}
