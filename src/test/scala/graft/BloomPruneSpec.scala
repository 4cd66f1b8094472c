package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomPrune

/** Bloom pruning must never drop a true member (no false negatives),
  * must actually prune non-members, and the pruned-then-exact-join
  * pipeline must be row-equal to the plain join it accelerates.
  */
class BloomPruneSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sf)

  test("no false negatives: every purchaser event survives the prune") {
    val purchasers = events.filter(col("event_type") === "purchase")
      .select("user_id").distinct()
    val bloom = BloomPrune.buildBloom(purchasers, col("user_id"), 100000L)
    val pruned = BloomPrune.prune(events, col("user_id"), bloom)
    val trueMembers = events.join(purchasers, Seq("user_id"))
    assert(trueMembers.exceptAll(pruned.join(purchasers, Seq("user_id"))).count() === 0)
  }

  test("the filter prunes non-members at the scan") {
    import spark.implicits._
    // members 0..99; fact keys 0..9999 → ≥ ~97% of rows should drop
    val dim = spark.range(100).toDF("k")
    val fact = spark.range(10000).toDF("k")
    val bloom = BloomPrune.buildBloom(dim, col("k"), 1000L)
    val kept = BloomPrune.prune(fact, col("k"), bloom).count()
    assert(kept >= 100, s"false negatives: only $kept of 100 members kept")
    assert(kept < 1000, s"no pruning happened: $kept of 10000 rows kept")
  }

  test("bloomPrunedStats == plain join + aggregate") {
    val got = marts.EventMarts.bloomPrunedStats(events)
    val purchasers = events.filter(col("event_type") === "purchase")
      .select("user_id").distinct()
    val want = events.join(purchasers, Seq("user_id"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("total_value"))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("empty build side prunes everything") {
    import spark.implicits._
    val dim = spark.range(0).toDF("k")
    val bloom = BloomPrune.buildBloom(dim, col("k"), 100L)
    assert(bloom.isEmpty)
    assert(BloomPrune.prune(spark.range(10).toDF("k"), col("k"), bloom).count() === 0)
  }
}
