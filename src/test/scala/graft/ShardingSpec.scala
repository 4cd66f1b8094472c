package graft

import org.apache.spark.sql.functions._
import graft.operators.Sharding

/** Sharding: HRW assignment is deterministic and total, every shard
  * takes load at gated size, and the minimal-motion law holds exactly
  * (the property rendezvous hashing exists for). */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  test("assignment is deterministic, total, and in range") {
    val keys = (1L to 400L).toDF("doc_id")
    val a1 = Sharding.hrwAssignments(keys, 8).as[(Long, Int)].collect().toMap
    val a2 = Sharding.hrwAssignments(keys, 8).as[(Long, Int)].collect().toMap
    assert(a1 === a2)
    assert(a1.size === 400)
    assert(a1.values.forall(s => s >= 0 && s < 8))
  }

  test("minimal motion: dropping a shard moves exactly its own keys") {
    val docs = Tables.documents(spark, sf)
    val row = Sharding.shardStability(docs)
      .select("n_total", "n_on_removed", "n_moved", "n_moved_unnecessarily",
        "minimal_motion")
      .as[(Long, Long, Long, Long, Boolean)].head()
    assert(row._5 === true)
    assert(row._3 === row._2)
    assert(row._4 === 0L)
  }

  test("every shard takes load and shares sum to 1") {
    val rows = Sharding.shardRouting(Tables.documents(spark, sf))
      .select("shard", "n_docs", "total_docs").as[(Int, Long, Long)].collect()
    assert(rows.length === Sharding.NumShards)
    assert(rows.map(_._2).sum === rows.head._3)
    assert(rows.forall(_._2 > 0), "a silent shard at this size means a hash bug")
  }
}
