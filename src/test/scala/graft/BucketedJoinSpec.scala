package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Bucketed mart storage must make same-key joins shuffle-free: both
  * sides were hash-clustered at WRITE time, so the sort-merge join
  * reads the buckets directly — the co-located-join contract that
  * kills the biggest per-query exchange at 100 TB.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join on the bucket key reads bucketed marts without a shuffle") {
    val orders = Mat.table(spark, sf, "bkt_orders_spec",
      bucketBy = Some(("customer_id", 8)))(
      Models.stgOrders(spark, sf).groupBy("customer_id")
        .agg(count(lit(1)).as("n_orders")))
    val customers = Mat.table(spark, sf, "bkt_customers_spec",
      bucketBy = Some(("customer_id", 8)))(
      Models.stgCustomers(spark, sf))
    // static plan check: disable AQE (it hides exchanges inside query
    // stages) and broadcast (a broadcast join would dodge the question)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = orders.join(customers, "customer_id")
      val smj = joined.queryExecution.executedPlan
        .collectFirst { case s: SortMergeJoinExec => s }
        .getOrElse(fail("expected a sort-merge join"))
      val shuffles = smj.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"bucketed join still shuffles: ${smj.treeString}")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }
}
