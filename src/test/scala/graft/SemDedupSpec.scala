package graft

import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** SemDeDup semantics on a handcrafted two-cluster fixture: pruning
  * happens only within a cluster, the smaller vec_id survives, and
  * the cap exempts (and flags) overflow members instead of silently
  * comparing them. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Float*) = xs.toArray

  test("prunes within-cluster near-dups, keeps the smaller id, leaves cross-cluster alone") {
    // cluster X around (1,0), cluster Y around (0,1); 1 and 2 are
    // near-identical (cos ≈ 1), 3 is X-but-distinct (cos < 0.5 to
    // both), 4 and 5 are near-identical in Y
    val emb = Seq(
      1L -> vec(1f, 0f), 2L -> vec(0.99f, 0.01f), 3L -> vec(0.4f, 0.3f),
      4L -> vec(0f, 1f), 5L -> vec(0.01f, 0.99f))
      .toDF("vec_id", "embedding")
    val cents = Seq(0L -> vec(1f, 0f), 1L -> vec(0f, 1f))
      .toDF("centroid_id", "centroid")
    val got = Similarity.semDedupPrune(emb, cents)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(2), if (r.isNullAt(3)) -1L else r.getLong(3),
          r.getLong(4), r.getBoolean(5))).toMap
    assert(got(1L) === ((0L, true, -1L, 0L, true)))   // survives
    assert(got(2L) === ((0L, true, 1L, 1L, false)))   // dup of 1
    // 3 assigns to X (cos(3, (1,0)) = 0.8 > cos(3, (0,1)) = 0.6) and
    // cos(3, 1) = 0.8 >= the 0.5 threshold — pruned as a semantic
    // near-dup of the cluster's surviving member, n_dups counts both
    // 1 and 2
    assert(got(3L) === ((0L, true, 1L, 2L, false)))
    assert(got(4L) === ((1L, true, -1L, 0L, true)))
    assert(got(5L) === ((1L, true, 4L, 1L, false)))
  }

  test("cap exempts overflow members and flags them") {
    // one cluster of identical vectors, twice the cap: members past
    // the cap must come back keep=true, in_scope=false — exempt, not
    // silently pruned, not silently compared
    val n = Similarity.SemDedupClusterCap * 2
    val emb = (1L to n.toLong).map(i => i -> vec(1f, 0f)).toDF("vec_id", "embedding")
    val cents = Seq(0L -> vec(1f, 0f)).toDF("centroid_id", "centroid")
    val got = Similarity.semDedupPrune(emb, cents)
      .select("vec_id", "in_scope", "keep").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(got.length === n)
    val (in, outOf) = got.partition(_._2)
    assert(in.length === Similarity.SemDedupClusterCap)
    // in scope: vec 1 survives, the rest are its dups
    assert(in.filter(_._3).map(_._1).toSeq === Seq(1L))
    assert(outOf.forall(_._3), "exempt members must not be pruned")
    assert(outOf.map(_._1).min === Similarity.SemDedupClusterCap + 1L)
  }
}
