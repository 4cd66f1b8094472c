package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.BoundedWindow

/** BoundedWindow must be a drop-in for the unpartitioned window: same
  * values for ranking and running-frame functions, and a non-empty
  * partitionSpec (so WindowExec's "No Partition Defined" WARN — kept
  * meaningful for ACCIDENTAL global windows — never fires for the
  * deliberate bounded ones). */
class BoundedWindowSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq((3L, 30L), (1L, 10L), (2L, 20L), (4L, 40L))
    .toDF("k", "v")

  test("orderBy: row_number and running sum equal the unpartitioned window") {
    val plain = df
      .withColumn("rn", row_number().over(Window.orderBy(col("k"))))
      .withColumn("cum", sum(col("v")).over(Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bounded = df
      .withColumn("rn", row_number().over(BoundedWindow.orderBy(col("k"))))
      .withColumn("cum", sum(col("v")).over(BoundedWindow.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(bounded.orderBy("k").collect().toSeq ===
      plain.orderBy("k").collect().toSeq)
  }

  test("all: whole-frame aggregate equals Window.partitionBy()") {
    val plain = df.withColumn("t", sum(col("v")).over(Window.partitionBy()))
    val bounded = df.withColumn("t", sum(col("v")).over(BoundedWindow.all))
    assert(bounded.orderBy("k").collect().toSeq ===
      plain.orderBy("k").collect().toSeq)
  }

  test("the declared constant key survives optimization (non-empty partitionSpec)") {
    // EliminateWindowPartitions would fold the key back out — the
    // session excludes it (BoundedWindow.ExcludedRule); assert on the
    // OPTIMIZED plan (the executed one hides behind AQE until run)
    val bounded = df.withColumn("rn",
      row_number().over(BoundedWindow.orderBy(col("k"))))
    val wins = bounded.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty)
    assert(wins.forall(_.partitionSpec.nonEmpty))
  }
}
