package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Scans

/** Scans.prefixSums: byte-identical to the naive single-partition
  * window for any input (negatives included), and the two-phase plan
  * reuses ONE range exchange (the Ranks single-execution guarantee). */
class ScansSpec extends SparkSpec {
  import spark.implicits._

  private def naive(rows: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] = {
    val sorted = rows.sortBy(_._1)
    var (ca, cb) = (0L, 0L)
    sorted.map { case (k, a, b) => ca += a; cb += b; (k, ca, cb) }
  }

  test("equals the naive running sum on random data with negatives") {
    val rng = new scala.util.Random(42)
    val rows = (1 to 500).map(i =>
      (i.toLong * 7 % 4999, rng.nextLong() % 1000, rng.nextLong() % 1000))
      .groupBy(_._1).map(_._2.head).toSeq // unique keys
    val df = rows.toDF("k", "a", "b").repartition(4)
    val got = Scans.prefixSums(df, "k", Seq("a", "b"))
      .select("k", "cum_a", "cum_b")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === naive(rows))
  }

  test("single row and empty input") {
    val one = Scans.prefixSums(Seq((5L, 3L)).toDF("k", "x"), "k", Seq("x"))
      .select("k", "cum_x").as[(Long, Long)].collect()
    assert(one.toSeq === Seq((5L, 3L)))
    val empty = Scans.prefixSums(
      Seq.empty[(Long, Long)].toDF("k", "x"), "k", Seq("x"))
    assert(empty.count() === 0)
  }

  test("the offsets and local sums share one reused range exchange") {
    // AQE hides reuse inside runtime stages; assert on the static plan
    // (the RanksSpec convention — the canonical-subtree property AQE
    // stage-reuse keys on is the same one).
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("k", "x")
      val plan = Scans.prefixSums(df, "k", Seq("x")).queryExecution.executedPlan
      val live = plan.collectWithSubqueries {
        case e: ShuffleExchangeExec if e.outputPartitioning.isInstanceOf[RangePartitioning] => e
      }
      val reused = plan.collectWithSubqueries { case r: ReusedExchangeExec => r }
      assert(live.size === 1, s"expected one live range exchange, got ${live.size}")
      assert(reused.nonEmpty, "expected the offsets subplan to reuse the range exchange")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
}
