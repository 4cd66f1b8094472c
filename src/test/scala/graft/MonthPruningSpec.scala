package graft

import java.sql.Date

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The month-partitioned mart layout must actually PRUNE: a date-range
  * filter on the time key alone (no reference to the internal
  * `__p_month` column) must reach the scan as a partition filter via
  * the MonthPruning optimizer rule, and the scan must list only the
  * matching months — with values identical to the unpruned read.
  */
class MonthPruningSpec extends SparkSpec {

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(fail("no FileSourceScanExec in plan"))

  test("date-range filter on the time key prunes __p_month partitions") {
    val ta = Models.timeAnalytics(spark, sf)
    val lo = Date.valueOf("1998-03-05")
    val hi = Date.valueOf("1998-04-10")
    val filtered = ta.filter(col("date_day") >= lit(lo) && col("date_day") <= lit(hi))
    val scan = scanOf(filtered)
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "__p_month")),
      s"no derived partition filter in: ${scan.partitionFilters}")
    val total = scanOf(ta).selectedPartitions.partitionCount
    val pruned = scan.selectedPartitions.partitionCount
    assert(pruned === 2, s"expected the two straddled months, read $pruned")
    assert(total > 12, s"mart unexpectedly small: $total partitions")
    // pruning must not change results: compare against an in-memory
    // filter of the full read
    val expected = ta.select("date_day").collect()
      .count(r => !r.isNullAt(0) && {
        val d = r.getDate(0); !d.before(lo) && !d.after(hi)
      })
    assert(filtered.count() === expected)
  }

  test("equality and single-bound predicates derive partition bounds") {
    val ta = Models.timeAnalytics(spark, sf)
    val eqScan = scanOf(ta.filter(col("date_day") === lit(Date.valueOf("1998-03-05"))))
    assert(eqScan.selectedPartitions.partitionCount === 1)
    val total = scanOf(ta).selectedPartitions.partitionCount
    val loScan = scanOf(ta.filter(col("date_day") > lit(Date.valueOf("1998-03-05"))))
    assert(loScan.selectedPartitions.partitionCount < total)
    assert(loScan.partitionFilters.exists(_.references.exists(_.name == "__p_month")))
  }

  test("a filter already naming __p_month is left untouched (idempotence)") {
    // the rule must not stack derived conjuncts under the optimizer's
    // fixpoint; a second planning of the same query is byte-stable
    val ta = Models.timeAnalytics(spark, sf)
    val q = ta.filter(col("date_day") >= lit(Date.valueOf("1998-03-05")))
    val once = scanOf(q).partitionFilters.map(_.sql)
    val twice = scanOf(ta.filter(col("date_day") >= lit(Date.valueOf("1998-03-05"))))
      .partitionFilters.map(_.sql)
    assert(once === twice)
  }
}
