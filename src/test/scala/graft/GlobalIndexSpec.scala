package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.SparkPlan
import graft.operators.GlobalIndex

/** Two-phase global index: exact equivalence with the naive global
  * row_number, contiguity, epoch independence, and the plan shape the
  * operator exists for — the corpus-scale window is PARTITIONED; the
  * only unpartitioned window runs over the bounded bucket domain.
  */
class GlobalIndexSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  test("equals the single-window global row_number") {
    val two = GlobalIndex.epochShuffle(docs)
    val h = graft.llm.Dedup.hex60(
      concat(lit(s"${GlobalIndex.EpochSaltPrefix}0|"), col("doc_id").cast("string")))
    val naive = docs.select(col("doc_id"), h.as("h"))
      .withColumn("expected",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("h"), col("doc_id"))).cast("long") - 1)
      .select("doc_id", "expected")
    val diff = two.join(naive, Seq("doc_id"))
      .filter(col("shuffle_pos") =!= col("expected")).count()
    assert(diff === 0L)
  }

  test("positions are a contiguous 0..n-1 permutation") {
    val n = docs.count()
    val stats = GlobalIndex.epochShuffle(docs)
      .agg(countDistinct(col("shuffle_pos")).as("d"),
        min(col("shuffle_pos")).as("lo"), max(col("shuffle_pos")).as("hi"))
      .head()
    assert(stats.getLong(0) === n)
    assert(stats.getLong(1) === 0L)
    assert(stats.getLong(2) === n - 1)
  }

  test("different epochs give different orders (same id set)") {
    val e0 = GlobalIndex.epochShuffle(docs, epoch = 0)
    val e1 = GlobalIndex.epochShuffle(docs, epoch = 1)
    val moved = e0.withColumnRenamed("shuffle_pos", "p0")
      .join(e1.withColumnRenamed("shuffle_pos", "p1"), Seq("doc_id"))
      .filter(col("p0") =!= col("p1")).count()
    assert(moved > 0L, "epoch salt did not reshuffle anything")
  }

  test("corpus window is partitioned; only the bucket cumsum is global") {
    // AQE wraps the plan in one AdaptiveSparkPlanExec leaf (the
    // PlanGuardSpec gotcha) — audit with it off
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = GlobalIndex.epochShuffle(docs).queryExecution.executedPlan
      def all(p: SparkPlan): Seq[SparkPlan] =
        p +: (p.children ++ p.subqueries).flatMap(all)
      val ws = all(plan).collect { case w: WindowExec => w }
      assert(ws.nonEmpty, s"no windows found in:\n$plan")
      val (global, partitioned) = ws.partition(_.partitionSpec.isEmpty)
      // the data-scaled row_number window must be partitioned (by bucket)
      assert(partitioned.nonEmpty, s"no partitioned window in:\n$plan")
      // any unpartitioned window must sit above the bucket-count
      // aggregate (bounded domain), never above the corpus scan
      global.foreach { w =>
        val aggBelow = all(w).collectFirst {
          case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
            if a.output.exists(_.name.contains("__gi_n")) => a
        }
        assert(aggBelow.nonEmpty,
          s"unpartitioned window not above the bucket-count aggregate:\n$w")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
