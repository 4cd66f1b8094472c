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

  test("globalRank executes the range exchange once (ReusedExchange in plan)") {
    // ADVICE r3 #1: offset correctness requires the offsets subplan and
    // the ranks subplan to observe the SAME partition assignment. That
    // is guaranteed structurally only if the range exchange is
    // materialized once and reused — assert exactly one live
    // RangePartitioning exchange plus at least one ReusedExchange.
    // AQE hides reuse inside runtime query stages; assert on the static
    // physical plan (AQE off) — the property proven (canonically
    // identical exchange subtrees) is the same one AQE stage-reuse
    // keys on, so the guarantee carries over to adaptive runs.
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = spark.range(5000).select(col("id"), (col("id") % 11).cast("double").as("m"))
      val plan = Ranks.globalRank(df, "id", col("m"), "rk").queryExecution.executedPlan
      val live = plan.collectWithSubqueries {
        case e: ShuffleExchangeExec if e.outputPartitioning.isInstanceOf[RangePartitioning] => e
      }
      val reused = plan.collectWithSubqueries { case r: ReusedExchangeExec => r }
      assert(live.size === 1, s"expected one live range exchange, got ${live.size}")
      assert(reused.nonEmpty, "expected the offsets subplan to reuse the range exchange")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("globalRank ranks are a dense permutation of 1..N") {
    val df = spark.range(500).select(col("id"), (col("id") % 7).cast("double").as("m"))
    val r = Ranks.globalRank(df, "id", col("m"), "rk")
    assert(r.agg(countDistinct(col("rk"))).head.getLong(0) === 500)
    assert(r.agg(min(col("rk"))).head.getInt(0) === 1)
    assert(r.agg(max(col("rk"))).head.getInt(0) === 500)
  }
}
