package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** RangeJoin.bucketed must be row-for-row equal to the plain non-equi
  * interval join — boundary values, multi-bucket ranges, overlapping
  * ranges, and left-outer misses included — while planning as an
  * EQUI-join (the entire point: no nested-loop pair blowup).
  */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val fact = Seq(
    (1L, 0.0), (2L, 49.999), (3L, 50.0), // 50.0 sits exactly on lo/hi
    (4L, 123.4), (5L, 250.0), (6L, 999.0) // 999 matches nothing
  ).toDF("id", "v")
  // "wide" spans many buckets; "low"/"overlap" overlap each other
  private lazy val ranges = Seq(
    ("low", 0.0, 50.0), ("overlap", 25.0, 75.0),
    ("mid", 50.0, 200.0), ("wide", 0.0, 300.0)
  ).toDF("name", "lo", "hi")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "v", "name").collect()
      .map(r => (r.getLong(0), r.getDouble(1), if (r.isNullAt(2)) "" else r.getString(2)))
      .sorted.toSeq

  test("bucketed inner join equals the plain interval join") {
    val naive = fact.join(ranges, col("v") >= col("lo") && col("v") < col("hi"))
    val bucketed = RangeJoin.bucketed(fact, ranges, col("v"), col("lo"), col("hi"), 50.0)
    assert(canon(bucketed) === canon(naive))
    assert(canon(bucketed).nonEmpty)
  }

  test("bucketed left join keeps unmatched fact rows") {
    val naive = fact.join(ranges, col("v") >= col("lo") && col("v") < col("hi"), "left")
    val bucketed = RangeJoin.bucketed(fact, ranges, col("v"), col("lo"), col("hi"), 50.0,
      joinType = "left")
    assert(canon(bucketed) === canon(naive))
    assert(canon(bucketed).exists(_._1 == 6L)) // the miss survives
  }

  test("an interval spanning more buckets than the cap fails fast with a tuning message") {
    // an open-ended sentinel hi (the classic bad-units bug) must raise
    // a targeted error, not build a two-billion-element sequence
    val sentinel = Seq(("bad", 0.0, 1.0e9)).toDF("name", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.bucketed(fact, sentinel, col("v"), col("lo"), col("hi"), 50.0)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("maxBucketsPerRange")),
      s"expected replication-guard error, got: ${messages(e).mkString(" | ")}")
    // a raised cap lets the same ranges through (guard, not a hard limit)
    val wide = RangeJoin.bucketed(fact, sentinel, col("v"), col("lo"), col("hi"),
      1.0e8, maxBucketsPerRange = 64)
    assert(wide.count() === fact.count()) // every v in [0, 1e9)
  }

  test("null-bounded ranges are dropped, not raised on") {
    // a NULL lo/hi can never satisfy lo <= v < hi — the guard must let
    // the row fall through to the NULL sequence (explode drops it),
    // not abort the job with a null-message raise_error
    val withNull = Seq(("ok", Some(0.0), Some(50.0)), ("open", Some(0.0), None))
      .toDF("name", "lo", "hi")
    val out = RangeJoin.bucketed(fact, withNull, col("v"), col("lo"), col("hi"), 50.0)
    assert(out.select("name").distinct().collect().map(_.getString(0)).toSeq === Seq("ok"))
  }

  test("plans as an equi-join, not a nested-loop join") {
    val plan = RangeJoin.bucketed(fact, ranges, col("v"), col("lo"), col("hi"), 50.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
