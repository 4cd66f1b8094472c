package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Change data feed ([[operators.Cdc]]): the diff of two keyed
  * snapshots must be exactly the Delta CDF row set, reconstruct the
  * after-snapshot when applied to the before-snapshot, and — when the
  * snapshots are versions of a mart bucketed on the key — cost ZERO
  * shuffles (a co-located per-bucket merge, the property that makes
  * diffing two 100 TB snapshots affordable).
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String, Long)*) =
    rows.toDF("id", "name", "score")

  test("emits insert/delete/update pre+post images, nothing for unchanged rows") {
    val before = snap((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
    val after  = snap((2L, "b", 20L), (3L, "c", 31L), (4L, "d", 40L))
    val got = operators.Cdc.changes(before, after, Seq("id"))
      .select("id", "name", "score", "_change_type").as[(Long, String, Long, String)]
      .collect().toSet
    assert(got === Set(
      (1L, "a", 10L, "delete"),
      (3L, "c", 30L, "update_preimage"),
      (3L, "c", 31L, "update_postimage"),
      (4L, "d", 40L, "insert")))
  }

  test("null-safe comparison: null -> value and value -> null are updates; null == null is unchanged") {
    val before = Seq((1L, Option.empty[Long]), (2L, Some(5L)), (3L, Option.empty[Long])).toDF("id", "v")
    val after  = Seq((1L, Some(7L)), (2L, Option.empty[Long]), (3L, Option.empty[Long])).toDF("id", "v")
    val got = operators.Cdc.changes(before, after, Seq("id"))
      .groupBy("id").agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L)) // id 3 unchanged: no rows
  }

  test("applying the feed to the before-snapshot reconstructs the after-snapshot") {
    val cdc = Models.martChanges(spark, sf)
    val v1 = Mat.tableVersion(spark, sf, "customers_snap", 1)
    val v2 = Mat.tableVersion(spark, sf, "customers_snap", 2)
    assert(Seq("insert", "delete", "update_preimage", "update_postimage")
      .forall(t => cdc.filter(col("_change_type") === t).limit(1).count() == 1L),
      "expected all four change types in the customers snapshot feed")
    val removed = cdc.filter(col("_change_type").isin("delete", "update_preimage")).drop("_change_type")
    val added = cdc.filter(col("_change_type").isin("insert", "update_postimage")).drop("_change_type")
    val rebuilt = v1.exceptAll(removed).unionByName(added)
    assert(rebuilt.exceptAll(v2).count() === 0 && v2.exceptAll(rebuilt).count() === 0)
  }

  test("diff of two versions of a key-bucketed mart is shuffle-free") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val cdc = Models.martChanges(spark, sf)
      val smj = cdc.queryExecution.executedPlan
        .collectFirst { case s: SortMergeJoinExec => s }
        .getOrElse(fail("expected a sort-merge join in the CDC plan"))
      val shuffles = smj.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty, s"bucketed CDC join still shuffles: ${smj.treeString}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("maintained aggregate equals a full re-aggregation of the after snapshot") {
    val maintained = Models.cdcIncrementalAgg(spark, sf)
      .select(col("customer_type"), col("n_customers"),
        col("total_lifetime_spend").cast("decimal(18,2)").as("t"))
    val recomputed = Mat.tableVersion(spark, sf, "customers_snap", 2)
      .groupBy("customer_type")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("lifetime_spend")).cast("decimal(18,2)").as("t"))
    assert(maintained.exceptAll(recomputed).count() === 0 &&
      recomputed.exceptAll(maintained).count() === 0)
    // a vanished group must disappear: feed that deletes every member
    val base = Seq(("x", 2L, BigDecimal("10.00")), ("y", 1L, BigDecimal("5.00")))
      .toDF("k", "n", "total")
    val feed = Seq(("x", BigDecimal("4.00"), "delete"), ("x", BigDecimal("6.00"), "delete"))
      .toDF("k", "v", "_change_type")
    val after = operators.Cdc.maintainAgg(base, feed, "k", "v")
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map { case (k, n, t) => k -> ((n, BigDecimal(t))) }.toMap
    assert(after === Map("y" -> ((1L, BigDecimal("5.00")))))
  }

  test("identical snapshots produce an empty feed") {
    val s1 = snap((1L, "a", 1L), (2L, "b", 2L))
    assert(operators.Cdc.changes(s1, s1, Seq("id")).count() === 0)
  }
}
