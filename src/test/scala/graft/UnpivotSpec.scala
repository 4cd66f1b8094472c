package graft

import org.apache.spark.sql.functions._
import graft.operators.Unpivot

/** Unpivot.melt: one row per (id row, value column), metric = column
  * name, nulls kept, and the plan is a single Expand pass (no union of
  * per-metric scans, no shuffle). */
class UnpivotSpec extends SparkSpec {
  import spark.implicits._

  test("melt reshapes wide to long, keeping null cells") {
    val df = Seq((1L, 10.0, 20.0), (2L, 30.0, 40.0)).toDF("id", "a", "b")
      .withColumn("c", when(col("id") === 1, lit(5.0)))
    val long = Unpivot.melt(df, Seq("id"), Seq("a", "b", "c"))
    assert(long.columns.toSeq === Seq("id", "metric", "value"))
    val rows = long.collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(rows === Set(
      (1L, "a", 10.0), (1L, "b", 20.0), (1L, "c", 5.0),
      (2L, "a", 30.0), (2L, "b", 40.0), (2L, "c", null)))
  }

  test("the melt plan is one Expand, zero exchanges") {
    val df = Seq((1L, 10.0, 20.0)).toDF("id", "a", "b")
    val plan = Unpivot.melt(df, Seq("id"), Seq("a", "b"))
      .queryExecution.executedPlan
    def all(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: p.children.flatMap(all)
    val nodes = all(plan)
    assert(nodes.count(_.isInstanceOf[org.apache.spark.sql.execution.ExpandExec]) === 1)
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]))
  }
}
