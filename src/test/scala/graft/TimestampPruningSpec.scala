package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** MonthPruning over a TIMESTAMP time key (VERDICT r4 "Next round"
  * #6): the writer zone recorded at Mat build time — not the reader's
  * session conf — converts timestamp bounds to month partitions, so a
  * range filter prunes even when the reading session has switched
  * zones since the build.
  */
class TimestampPruningSpec extends SparkSpec {

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(fail("no FileSourceScanExec in plan"))

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  private lazy val mart = {
    import spark.implicits._
    // four months of timestamped rows, including instants near month
    // boundaries where a wrong zone conversion would flip the month
    val rows = (1 to 4).flatMap { m =>
      Seq(
        (ts(f"1997-0$m%d-01T00:30:00Z"), m.toLong * 10),
        (ts(f"1997-0$m%d-15T12:00:00Z"), m.toLong * 10 + 1),
        (ts(f"1997-0$m%d-28T23:30:00Z"), m.toLong * 10 + 2))
    }
    Mat.table(spark, sf, "ts_prune_spec", timeKey = Some("event_ts"))(
      rows.toDF("event_ts", "v"))
  }

  test("timestamp-range filter on the time key prunes __p_month partitions") {
    val lo = ts("1997-02-10T00:00:00Z")
    val hi = ts("1997-03-20T00:00:00Z")
    val filtered = mart.filter(col("event_ts") >= lit(lo) && col("event_ts") <= lit(hi))
    val scan = scanOf(filtered)
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "__p_month")),
      s"no derived partition filter in: ${scan.partitionFilters}")
    assert(scan.selectedPartitions.partitionCount === 2,
      "expected exactly the two straddled months")
    assert(scanOf(mart).selectedPartitions.partitionCount === 4)
    // qualifying rows: Feb 15, Feb 28, Mar 01, Mar 15
    assert(filtered.count() === 4)
  }

  test("pruning uses the recorded writer zone, not the reader session zone") {
    mart.count() // force the build under the default (UTC) session zone
    val tzKey = "spark.sql.session.timeZone"
    val prev = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/Los_Angeles")
      // 01:00Z on Mar 1 is still February in LA — if the rule converted
      // with the READER zone it would derive Feb..Mar and read 2
      // partitions AND (worse, for upper bounds) could drop qualifying
      // rows; with the recorded UTC writer zone it reads March alone.
      val lo = ts("1997-03-01T01:00:00Z")
      val hi = ts("1997-03-31T00:00:00Z")
      val filtered = mart.filter(col("event_ts") >= lit(lo) && col("event_ts") <= lit(hi))
      assert(scanOf(filtered).selectedPartitions.partitionCount === 1)
      // qualifying rows: Mar 15, Mar 28 (Mar 01 00:30Z < lo)
      assert(filtered.count() === 2)
    } finally spark.conf.set(tzKey, prev)
  }
}
