package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ranks

/** Ranks.globalRank must be byte-identical to the single-partition
  * global window it replaces — for ties, nulls, and inputs larger than
  * one range partition.
  */
class RanksSpec extends SparkSpec {

  private def naive(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("rk", row_number().over(
      Window.orderBy(col("m").desc_nulls_last, col("id"))))
      .select("id", "rk")

  test("globalRank == global window row_number (ties, nulls, multi-partition)") {
    import spark.implicits._
    // deterministic pseudo-random metrics: heavy ties (mod 17), nulls,
    // 10k rows over 4 shuffle partitions
    val df = spark.range(10000).select(
      col("id"),
      when(col("id") % 13 === 0, lit(null))
        .otherwise((col("id") * 2654435761L % 17).cast("double")).as("m"))
    val fast = Ranks.globalRank(df, "id", col("m"), "rk")
    val diff = fast.join(naive(df).withColumnRenamed("rk", "rk0"), Seq("id"))
      .filter(col("rk") =!= col("rk0")).count()
    assert(diff === 0)
    assert(fast.count() === 10000)
  }

  test("products/supplies builds contain no global (unpartitioned) window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val productsBuild = graft.marts.AnalyticsMarts.productsFinal(
      graft.marts.AnalyticsMarts.productsCore(
        Models.stgProducts(spark, sf), Models.orderItems(spark, sf), Models.orders(spark, sf)))
    val suppliesBuild = graft.marts.AnalyticsMarts.supplies(
      graft.marts.AnalyticsMarts.supplyPerformance(
        Models.stgSupplies(spark, sf), Models.orderItems(spark, sf)))
    for (df <- Seq(productsBuild, suppliesBuild)) {
      val global = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(global.isEmpty, s"unpartitioned Window in plan: $global")
    }
  }

  test("globalRank ranks are a dense permutation of 1..N") {
    val df = spark.range(500).select(col("id"), (col("id") % 7).cast("double").as("m"))
    val r = Ranks.globalRank(df, "id", col("m"), "rk")
    assert(r.agg(countDistinct(col("rk"))).head.getLong(0) === 500)
    assert(r.agg(min(col("rk"))).head.getInt(0) === 1)
    assert(r.agg(max(col("rk"))).head.getInt(0) === 500)
  }
}
