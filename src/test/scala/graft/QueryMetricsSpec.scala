package graft

import org.apache.spark.sql.functions._
import graft.operators.QueryMetrics

/** Query-history listener: completed actions are recorded with
  * duration and output rows; the history reads back as a DataFrame.
  */
class QueryMetricsSpec extends SparkSpec {

  test("actions land in the history with duration and row counts") {
    import spark.implicits._
    QueryMetrics.install(spark)
    QueryMetrics.reset(spark)
    Seq(1, 2, 3).toDF("x").filter(col("x") > 1).collect()
    // listener callbacks are asynchronous on the listener bus — wait
    // for the record instead of asserting instantly
    var tries = 0
    while (QueryMetrics.history(spark).count() == 0 && tries < 50) {
      Thread.sleep(100); tries += 1
    }
    val h = QueryMetrics.history(spark).filter(col("succeeded"))
    assert(h.count() >= 1)
    val r = h.orderBy(col("durationMs").desc).head()
    assert(r.getAs[Long]("durationMs") >= 0)
    // output rows must come through the AQE/codegen wrappers: the
    // filtered collect returned 2 rows, so -1 means the metric probe
    // stopped at a wrapper without numOutputRows
    assert(h.filter(col("funcName") === "collect")
      .select("outputRows").head().getLong(0) === 2L)
    // install is idempotent — no duplicate records from a second call
    QueryMetrics.install(spark)
    QueryMetrics.reset(spark)
    Seq(1).toDF("y").collect()
    tries = 0
    while (QueryMetrics.history(spark).count() == 0 && tries < 50) {
      Thread.sleep(100); tries += 1
    }
    // restrict to the ONE collect action: the history-polling count()
    // calls above are themselves recorded actions and would make any
    // blanket per-funcName cardinality check racy
    val collects = QueryMetrics.history(spark)
      .filter(col("funcName") === "collect").count()
    assert(collects === 1, "duplicate listener registration detected")
    // per-session isolation: a sibling session has its own (empty)
    // history and its own registration
    val sib = spark.newSession()
    QueryMetrics.install(sib)
    assert(QueryMetrics.history(sib).count() === 0)
  }
}
