package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.TopKAggregate.top_k

/** The bounded-heap top_k aggregate must be row-equal to the
  * row_number window with the same total order (score desc, payload
  * asc), and must plan as a partial+final ObjectHashAggregate pair —
  * the map-side-combine shape that bounds shuffle volume to k entries
  * per group per task at scale.
  */
class TopKSpec extends SparkSpec {

  private def viaTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(top_k(col("s"), col("p"), k).as("tk"))
      .select(col("g"), posexplode(col("tk")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("col.payload").as("p"), col("col.score").as("s"))

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rank", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("s").desc, col("p"))))
      .filter(col("rank") <= k)
      .select(col("g"), col("rank").cast("long"), col("p"), col("s"))

  /** 20k rows, 7 groups, heavy score ties (mod 23) to exercise the
    * payload tie-break, nulls dropped, spread over 4 partitions. */
  private def fixture = spark.range(20000).select(
    (col("id") % 7).cast("string").as("g"),
    when(col("id") % 41 === 0, lit(null))
      .otherwise((col("id") * 2654435761L % 23).cast("double")).as("s"),
    col("id").as("p"))

  test("top_k == windowed row_number (ties, nulls, multi-partition)") {
    val k = 5
    val a = viaTopK(fixture, k)
    val b = viaWindow(fixture, k)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
    assert(a.count() === 7L * k)
  }

  test("top_k with string payload ties breaks ascending") {
    import spark.implicits._
    val df = Seq(("g", 1.0, "b"), ("g", 1.0, "a"), ("g", 1.0, "c"), ("g", 2.0, "z"))
      .toDF("g", "s", "p")
    val got = df.groupBy(col("g")).agg(top_k(col("s"), col("p"), 2).as("tk"))
      .select(explode(col("tk"))).select(col("col.payload")).as[String].collect()
    assert(got.toSeq === Seq("z", "a"))
  }

  test("top_k plans as partial+final ObjectHashAggregate (map-side combine)") {
    // AQE wraps the plan in one AdaptiveSparkPlanExec leaf (the
    // PlanGuardSpec gotcha) — inspect with it off.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      planAssertions()
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  private def planAssertions(): Unit = {
    val plan = viaTopK(fixture, 5).queryExecution.executedPlan
    val aggs = plan.collect {
      case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => o
    }
    assert(aggs.size === 2, s"expected partial+final ObjectHashAggregate, got:\n$plan")
    // the exchange between them carries the serialized heaps, keyed by
    // the group column — i.e. the partial pass ran upstream of the
    // shuffle, not after it (that is the whole point vs a window sort)
    val partialBelowExchange = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.child.collectFirst {
          case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => o
        }.nonEmpty => e
    }
    assert(partialBelowExchange.nonEmpty, s"no partial aggregate below the exchange:\n$plan")
  }

  test("NULL contract: null-score rows are ignored, not padded in") {
    import spark.implicits._
    // 2 non-null rows, k=3: the window twin (NULLS LAST) would emit a
    // third row carrying the null score; top_k documents min(k, n)
    val df = Seq(("g", Some(2.0), 1L), ("g", None, 2L), ("g", Some(1.0), 3L))
      .toDF("g", "s", "p")
    val got = df.groupBy(col("g")).agg(top_k(col("s"), col("p"), 3).as("tk"))
      .select(explode(col("tk"))).select(col("col.payload")).as[Long].collect()
    assert(got.toSeq === Seq(1L, 3L))
  }

  test("k larger than group size returns whole group, ordered") {
    import spark.implicits._
    val df = Seq(("g", 3.0, 30L), ("g", 1.0, 10L), ("g", 2.0, 20L)).toDF("g", "s", "p")
    val got = df.groupBy(col("g")).agg(top_k(col("s"), col("p"), 10).as("tk"))
      .select(explode(col("tk"))).select(col("col.payload")).as[Long].collect()
    assert(got.toSeq === Seq(30L, 10L, 20L).sorted.reverse)
  }
}
