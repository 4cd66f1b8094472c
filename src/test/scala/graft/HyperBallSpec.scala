package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Graph.hyperBall: per-node HLL ball-size estimates track the exact
  * ball sizes (from allPairsHopDistances) within small-range
  * linear-counting tolerance, are monotone across hops, and are
  * bit-deterministic. Graph.allPairsHopDistancesCapped: non-truncated
  * roots bit-match the uncapped operator; capped roots freeze with an
  * honest flag instead of silently missing nodes. */
class HyperBallSpec extends SparkSpec {
  import spark.implicits._

  // path 1-…-6 with a chord and a tail hub: exercises distinct ball
  // growth rates per node
  private val edgeSeq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (5L, 6L), (2L, 4L), (4L, 7L), (4L, 8L), (7L, 8L))
  private def edges = edgeSeq.toDF("src", "dst")

  test("estimates track exact ball sizes within HLL tolerance") {
    val maxHops = 3
    val est = Graph.hyperBall(edges, maxHops)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val exact = Graph.allPairsHopDistances(edges, maxHops)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val nodes = exact.map(_._1).distinct
    for (v <- nodes; t <- 0 to maxHops) {
      val truth = exact.count { case (r, _, d) => r == v && d <= t }
      val e = est((v, t))
      // m = 64 linear-counting regime: ±~15% from register collisions
      assert(math.abs(e - truth) <= math.max(1.0, 0.25 * truth),
        s"node $v hop $t: est $e vs exact $truth")
    }
    // hop 0 is the singleton ball everywhere
    nodes.foreach(v => assert(math.abs(est((v, 0)) - 1.0) < 0.1))
  }

  test("estimates are monotone in hop and bit-deterministic") {
    val a = Graph.hyperBall(edges, 3).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val b = Graph.hyperBall(edges, 3).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(a === b) // identical bits run-to-run
    a.keys.map(_._1).toSeq.distinct.foreach { v =>
      (1 to 3).foreach(t =>
        assert(a((v, t)) >= a((v, t - 1)),
          s"ball estimate shrank for node $v at hop $t"))
    }
  }

  test("capped: non-truncated roots bit-match uncapped; over-cap roots freeze flagged") {
    // root 1's ball: hop1 {1,2}, hop2 {..3}, hop3 blows past the cap
    // through hub 3 (fan 50..59), so node 60 at dist 4 goes unreached
    val fan = (50L to 59L).map(3L -> _)
    // island path 90-91-92: reaches ≤ 3 nodes, stays under any cap
    val e = (Seq((1L, 2L), (2L, 3L), (90L, 91L), (91L, 92L)) ++ fan
      :+ (50L, 60L)).toDF("src", "dst")
    val cap = 5L
    val got = Graph.allPairsHopDistancesCapped(e, 4, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(2), r.getBoolean(3)))
      .toMap
    val exact = Graph.allPairsHopDistances(e, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap

    // root 1 crossed the cap after hop 3 (13 rows > 5): flagged, and
    // the dist-4 tail node is absent (frozen frontier)
    assert(got((1L, 3L))._2 === true)
    assert(exact.contains((1L, 60L)) && !got.contains((1L, 60L)))
    // every row of a non-truncated root matches the exact operator
    val cleanRoots = got.collect { case ((r, _), (_, false)) => r }.toSet
    assert(cleanRoots.nonEmpty)
    cleanRoots.foreach { r =>
      val g = got.collect { case ((`r`, n), (d, _)) => n -> d }.toMap
      val x = exact.collect { case ((`r`, n), d) => n -> d }.toMap
      assert(g === x, s"non-truncated root $r must be exact")
    }
    // truncation is per-root-consistent: one flag value per root
    got.groupBy(_._1._1).foreach { case (r, rows) =>
      assert(rows.values.map(_._2).toSet.size === 1, s"mixed flags for root $r")
    }
  }

  test("linkPredictionsCapped: exact over the hub-free subgraph, hub-loss reported") {
    // square 1-2-3-4-1 (predicts diagonals) + hub 99 touching 1..5
    val e = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
      ++ (1L to 5L).map(_ -> 99L)).toDF("src", "dst")
    val got = Graph.linkPredictionsCapped(e, 10, hubCap = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(6), r.getLong(7))).toMap
    // hub 99 (degree 5) and its satellite 5 vanish; only the square's
    // diagonals remain, each with 2 common neighbors
    assert(got.keySet === Set((1L, 3L), (2L, 4L)))
    got.values.foreach { case (cn, ha, hb) =>
      assert(cn === 2L)
      assert(ha === 1L && hb === 1L) // each endpoint lost exactly hub 99
    }
    // and the kept-subgraph result equals plain linkPredictions on it
    val kept = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("src", "dst")
    val plain = Graph.linkPredictions(kept, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(plain === got.view.mapValues(_._1).toMap)
  }
}
