package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block-manager hygiene for iterative builders (VERDICT r6 #3).
  *
  * `localCheckpoint(eager = true)` pins the checkpointed RDD's blocks
  * in the block manager until the driver-side reference is GC'd AND
  * the ContextCleaner runs — across a few hundred query executions in
  * one session (the bench, a long-lived service) superseded per-round
  * checkpoints from Clusters/Bpe accumulate and squeeze execution
  * memory. Each loop therefore frees round k-1's checkpoint as soon
  * as round k's is MATERIALIZED (eager), at which point nothing can
  * ever read k-1 again: an eager checkpoint's data is self-contained,
  * and the freed frame is referenced by no other live plan (asserted
  * at each call site).
  *
  * NOT safe for lazy checkpoints (Kmeans's — deliberately lazy so
  * view registration doesn't run Lloyd): before materialization the
  * chain still reads its predecessors, and unpersisting a
  * materialized local checkpoint later would lose the data
  * unrecoverably (lineage is truncated). Kmeans's chain pins only
  * K-row blocks (~100 KB/round) and is left to the ContextCleaner.
  */
object Checkpoints {

  /** Unpersist the checkpointed RDD behind `df` (a localCheckpoint'd
    * frame whose plan ROOT is the LogicalRDD the checkpoint created).
    * Matches ONLY the root (ADVICE r7): a whole-plan traversal would
    * silently unpersist every LogicalRDD a derived frame references —
    * for a join of two checkpointed frames that is unrecoverable data
    * loss (lineage is truncated), so a non-root-checkpoint argument
    * fails loudly instead. Non-blocking: block removal proceeds async
    * while the caller's next round runs. */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false): Unit
      case other => throw new IllegalArgumentException(
        "Checkpoints.free expects a frame whose plan root is the " +
          s"checkpoint's LogicalRDD, got ${other.nodeName} — freeing a " +
          "derived frame would unpersist inputs other live plans still read")
    }
}
