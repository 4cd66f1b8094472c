package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile

/** Profile.profile: exact per-column counts off one aggregation pass,
  * nulls and duplicates counted correctly, and the aggregate subtree
  * appears ONCE in the plan (the melt must not re-run it per column). */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("counts rows, nulls, and distincts per column") {
    val df = Seq((1L, Some("a"), 1.0), (2L, Some("a"), 2.0),
      (3L, None, 2.0), (4L, Some("b"), 2.0)).toDF("id", "s", "v")
    val got = Profile.profile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      "id" -> ((4L, 0L, 4L)),
      "s" -> ((4L, 1L, 2L)),
      "v" -> ((4L, 0L, 2L))))
  }

  test("the aggregation executes once: a single HashAggregate chain in the plan") {
    // AQE wraps the plan in one adaptive leaf (the PlanGuardSpec
    // gotcha) — inspect the static plan.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      val plan = Profile.profile(df, Seq("id", "s"))
        .queryExecution.executedPlan
      def all(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
        p +: p.children.flatMap(all)
      // multiple distinct aggregates plan as Expand -> partial -> final:
      // exactly one Expand and no union of repeated aggregate branches
      val nodes = all(plan)
      assert(nodes.count(_.isInstanceOf[org.apache.spark.sql.execution.ExpandExec]) === 1)
      assert(!nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.UnionExec]))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
