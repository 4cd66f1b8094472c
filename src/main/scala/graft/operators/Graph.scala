package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph traversal: co-occurrence edge derivation and
  * bounded-depth BFS hop distances — the iterative-relaxation family
  * next to the pointer-jump connected components already in
  * [[graft.llm.Clusters]] (reference scope: none — the reference has
  * no graph surface; driver-brief beyond-parity, the "related
  * products" / link-graph locality signal a crawl curation pipeline
  * computes).
  *
  * Scale design (100 TB):
  *  - Edge derivation is a self-join keyed on the GROUP id (order):
  *    per-group fan-out is C(items, 2), bounded by group size — never
  *    all-pairs across the corpus. The output is distinct 8-byte id
  *    pairs; the raw rows never shuffle twice.
  *  - BFS is |frontier|-bounded per round: round h shuffles the
  *    CURRENT distance table (≤ |V| rows of two integers) against the
  *    edge table, and the min-relaxation is an integer MIN —
  *    partition-order independent, so results are deterministic under
  *    any parallelism and both engines agree bit-for-bit.
  *  - Lineage is checkpoint-bounded per round (the
  *    [[graft.plans.Checkpoints]] discipline from Clusters/Bpe): at
  *    depth k the plan is one round deep, not k joins deep, and round
  *    h-1's blocks are freed the moment round h materializes.
  */
object Graph {

  /** Undirected distinct co-occurrence edges (src < dst) from
    * (group, item) rows: items sharing a group are connected.
    * `groupCol`/`itemCol` name the input columns. */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String): DataFrame = {
    val g = df.select(col(groupCol).as("g"), col(itemCol).as("i")).distinct()
    val a = g.as("a"); val b = g.as("b")
    a.join(b, col("a.g") === col("b.g") && col("a.i") < col("b.i"))
      .select(col("a.i").as("src"), col("b.i").as("dst"))
      .distinct()
  }

  /** Hop distance from the source set within `maxHops` rounds:
    * (node, dist), dist ∈ [0, maxHops], unreached nodes absent.
    * `sources` is a one-column (node) frame; edges are treated as
    * undirected (symmetrized here — callers pass each edge once). */
  def bfsDistances(edges: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
    var dist = sources.select(col("node"), lit(0).as("dist"))
      .localCheckpoint(true)
    for (h <- 1 to maxHops) {
      val prev = dist
      val reached = dist.join(sym, dist("node") === sym("src"))
        .select(sym("dst").as("node"), lit(h).as("dist"))
      dist = dist.unionByName(reached)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint(true)
      graft.plans.Checkpoints.free(prev)
    }
    dist
  }
}
