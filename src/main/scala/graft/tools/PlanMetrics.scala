package graft.tools

import org.apache.spark.sql.DataFrame

/** Post-execution plan metrics shared by the bench and the scale
  * probe: measured shuffle bytes of an EXECUTED plan (final AQE plan,
  * reused exchanges counted once) — the per-query number that answers
  * "is there a shuffle here that becomes the bottleneck at scale"
  * with a measurement instead of a guess. */
object PlanMetrics {

  private def walkExecuted(df: DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case _ => p.children
      }
      p +: (kids ++ p.subqueries).flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  /** Sum of shuffleBytesWritten over every ShuffleExchangeExec in the
    * executed plan (AQE stages and subqueries included). Call AFTER
    * an action has run the plan; unexecuted metrics read 0. */
  def shuffleBytesOf(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    walkExecuted(df)
      .collect { case e: ShuffleExchangeExec =>
        e.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L) }
      .sum
  }

  /** Join strategies chosen in the EXECUTED (final AQE) plan, in walk
    * order — the per-query answer to "did the join I expected to
    * broadcast actually broadcast". Call after an action. */
  def joinStrategiesOf(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.joins._
    walkExecuted(df).collect {
      case _: BroadcastHashJoinExec => "broadcast_hash"
      case _: BroadcastNestedLoopJoinExec => "broadcast_nested_loop"
      case _: ShuffledHashJoinExec => "shuffled_hash"
      case _: SortMergeJoinExec => "sort_merge"
    }
  }
}
