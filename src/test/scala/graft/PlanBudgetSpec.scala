package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

/** Shuffle-budget guard over EVERY registered batch query's physical
  * plan: each query's exchange counts (shuffles, broadcasts) are
  * recorded in `src/test/resources/plan_budgets.tsv`, and a plan that
  * GAINS a shuffle over its recorded budget fails here — before it
  * fails as a 2× exchange bill at 100 TB. PlanGuardSpec catches
  * categorically bad operators (cartesian products, unpartitioned
  * windows); this spec catches the quieter regression where an edit
  * silently adds an exchange to an otherwise-fine plan (a lost
  * bucketed-join co-location, a dropped broadcast hint, a new
  * repartition in a shared helper).
  *
  * Fewer shuffles than budget passes (and is reported as a tightening
  * opportunity); more fails. A NEW query must be added to the budget
  * file deliberately. After an intentional plan change, regenerate
  * (env var, not -D: sbt forks the test JVM and forwards the
  * environment, not system properties):
  *
  *   GRAFT_PLANBUDGET_REGEN=true sbt "testOnly graft.PlanBudgetSpec"
  *
  * and review the tsv diff like any other plan review. Budgets are
  * recorded at the spec's sf0.001 with AQE off (deterministic plans);
  * AQE may merge exchanges at runtime, never add them, so the budget
  * is an upper bound for the deployed plan too.
  */
class PlanBudgetSpec extends SparkSpec {

  private val budgetPath = java.nio.file.Paths.get(
    "src", "test", "resources", "plan_budgets.tsv")

  /** Streaming one-shots and dq_summary execute whole jobs at
    * construction and return sink/local relations — no standing plan
    * to budget (their shapes are covered by their own specs). */
  private val skip = Set(
    "stream_windowed_counts", "stream_sessions", "stream_segment_counts",
    "stream_dedup", "stream_attribution", "stream_attribution_outer",
    "stream_sink_parquet", "stream_sink_merge", "stream_user_rollup",
    "stream_neardup_pairs", "stream_quality_scores", "stream_ivm_agg",
    "stream_hll_users", "stream_cms_heavy",
    "stream_sessions_multibatch", "stream_segment_counts_multibatch",
    "stream_attribution_multibatch", "stream_user_rollup_multibatch",
    "stream_dedup_multibatch",
    "dq_summary")

  private def exchangeCounts(plan: SparkPlan): (Int, Int) = {
    def all(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children ++ p.subqueries).flatMap(all)
    val nodes = all(plan)
    (nodes.count(_.isInstanceOf[ShuffleExchangeExec]),
      nodes.count(_.isInstanceOf[BroadcastExchangeExec]))
  }

  test("no registered query exceeds its recorded exchange budget") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val actual: Seq[(String, (Int, Int))] = try {
      // AQE wraps the plan in one adaptive leaf (the PlanGuardSpec
      // gotcha) — counts must come from the static plan.
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot { case (name, _) => skip.contains(name) }
        .map { case (name, fn) =>
          name -> exchangeCounts(fn(spark, sf).queryExecution.executedPlan)
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)

    if (sys.env.get("GRAFT_PLANBUDGET_REGEN").contains("true")) {
      val header = "# query\tshuffles\tbroadcasts — regenerate with " +
        "GRAFT_PLANBUDGET_REGEN=true sbt \"testOnly graft.PlanBudgetSpec\"\n"
      val body = actual.map { case (n, (s, b)) => s"$n\t$s\t$b" }.mkString("\n")
      java.nio.file.Files.createDirectories(budgetPath.getParent)
      java.nio.file.Files.write(budgetPath,
        (header + body + "\n").getBytes("UTF-8"))
      info(s"regenerated ${budgetPath} with ${actual.size} budgets")
    } else {
      import scala.jdk.CollectionConverters._
      val recorded: Map[String, (Int, Int)] =
        java.nio.file.Files.readAllLines(budgetPath).asScala
          .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
          .map { l =>
            val Array(n, s, b) = l.split("\t")
            n -> (s.toInt, b.toInt)
          }.toMap
      val missing = actual.collect {
        case (n, _) if !recorded.contains(n) => n }
      assert(missing.isEmpty,
        s"queries without a recorded plan budget (add deliberately via " +
          s"regen): ${missing.mkString(", ")}")
      val over = actual.collect {
        case (n, (s, _)) if s > recorded(n)._1 =>
          s"$n: $s shuffles > budget ${recorded(n)._1}"
      }
      assert(over.isEmpty, s"plans gained shuffles: ${over.mkString("; ")}")
      val tighter = actual.collect {
        case (n, (s, _)) if s < recorded(n)._1 => s"$n ($s < ${recorded(n)._1})" }
      if (tighter.nonEmpty)
        info(s"budgets tightenable: ${tighter.mkString(", ")}")
    }
  }
}
