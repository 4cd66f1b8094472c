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

  test("profileApprox: no Expand, counts exact, estimate within HLL error of truth") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val docs = Tables.documents(spark, sf)
      val approx = Profile.profileApprox(docs, Models.DocumentsProfileCols)
      def all(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
        p +: p.children.flatMap(all)
      // the corpus-grain point: NO Expand anywhere in the plan
      assert(!all(approx.queryExecution.executedPlan)
        .exists(_.isInstanceOf[org.apache.spark.sql.execution.ExpandExec]))
      val got = approx.collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      val nDocs = docs.count()
      assert(got.keySet === Models.DocumentsProfileCols.toSet)
      // exact side: counters are exact even at corpus grain
      assert(got.values.forall { case (rows, nulls, _) => rows === nDocs && nulls === 0L })
      // sketch side: m=64 registers → ±13% standard error; allow 3σ
      // against the exact distinct (cast-to-string semantics, as the
      // operator hashes)
      Models.DocumentsProfileCols.foreach { c =>
        val exact = docs.select(col(c).cast("string")).distinct().count().toDouble
        val est = got(c)._3
        assert(math.abs(est - exact) <= 0.4 * exact + 3.0,
          s"$c: estimate $est vs exact $exact")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
