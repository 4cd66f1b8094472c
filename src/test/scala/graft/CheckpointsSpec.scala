package graft

import graft.plans.Checkpoints

/** Checkpoints.free's root-only contract (ADVICE r7): freeing a bare
  * checkpointed frame unpersists its blocks; freeing a DERIVED frame
  * (whose plan merely references checkpoints) must fail loudly instead
  * of silently unpersisting inputs other live plans still read. */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  test("free unpersists a frame whose plan root is the checkpoint") {
    val ck = Seq(1, 2, 3).toDF("x").localCheckpoint(true)
    val ckId = ck.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
      case other => fail(s"expected LogicalRDD root, got ${other.nodeName}")
    }
    assert(spark.sparkContext.getRDDStorageInfo.exists(_.id == ckId),
      "checkpoint blocks absent before free — test setup broken")
    Checkpoints.free(ck)
    // async unpersist: poll briefly for THIS rdd to leave the manager
    // (the shared session holds other specs' blocks — check only ours)
    val deadline = System.nanoTime() + 10e9.toLong
    var gone = false
    while (!gone && System.nanoTime() < deadline) {
      gone = !spark.sparkContext.getRDDStorageInfo.exists(_.id == ckId)
      if (!gone) Thread.sleep(50)
    }
    assert(gone, "checkpointed blocks were not unpersisted")
  }

  test("free rejects a derived frame instead of freeing its inputs") {
    val a = Seq(1, 2).toDF("x").localCheckpoint(true)
    val b = Seq(2, 3).toDF("x").localCheckpoint(true)
    val joined = a.join(b, "x")
    val e = intercept[IllegalArgumentException](Checkpoints.free(joined))
    assert(e.getMessage.contains("plan root"))
    // the inputs must still be readable (nothing was unpersisted)
    assert(a.count() == 2 && b.count() == 2)
  }
}
