package graft

import org.apache.spark.sql.functions._
import graft.llm.Clusters

/** connectedComponents must close pair edges transitively (the whole
  * point vs r3's pair-greedy rule) and converge within the bounded
  * rounds for any realistic diameter via its pointer-jump doubling.
  */
class ClustersSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("doc_a", "doc_b")
  }

  test("transitive chain A~B, B~C is one cluster with canonical A") {
    val c = Clusters.connectedComponents(edges((1L, 2L), (2L, 3L), (7L, 9L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(c === Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (7L, 7L, 2L), (9L, 7L, 2L)))
  }

  test("a 200-hop path closes in MaxIters rounds (pointer-jump doubling)") {
    // plain 1-hop propagation would need 200 rounds; the per-round
    // pointer jump makes 8 suffice for diameter <= ~2^8
    val path = edges((0L until 200L).map(i => (i, i + 1)): _*)
    val c = Clusters.connectedComponents(path)
    assert(c.count() === 201)
    assert(c.filter(col("cluster_id") =!= 0L || col("cluster_size") =!= 201L)
      .count() === 0)
  }

  test("components equal brute-force transitive closure on random graphs") {
    for (seed <- Seq(7, 42)) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val es = (1 to 70)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      // ground truth: BFS closure, canonical = min reachable vertex
      val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      def reachMin(v: Long): Long = {
        var seen = Set(v); var frontier = Set(v)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
          seen ++= frontier
        }
        seen.min
      }
      val expected = adj.keys.map(v => v -> reachMin(v)).toMap
      val got = Clusters.connectedComponents(edges(es: _*))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"seed $seed")
    }
  }

  test("nearDupEdges dedupes a pair found by both families") {
    import spark.implicits._
    val mh = Seq((1L, 2L, 5L), (3L, 4L, 2L)).toDF("doc_a", "doc_b", "n_shared_bands")
    val sh = Seq((1L, 2L), (5L, 6L)).toDF("doc_a", "doc_b")
    // (3,4) is below NearDupDropBands; (1,2) appears in both families once
    val e = Clusters.nearDupEdges(mh, sh)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e === Set((1L, 2L), (5L, 6L)))
  }
}
