package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed equi-joins (SURVEY §7 scale notes;
  * the brief's "salting for skew" technique).
  *
  * When one join key dominates (a hot product, a boilerplate shingle),
  * hash partitioning sends every row of that key to ONE task and the
  * stage runs at the speed of its hottest key. AQE's skew-join split
  * handles this at runtime for sort-merge joins; this operator is the
  * deterministic compile-time form for when the skew is known — and the
  * only option when the small side is too big to broadcast but small
  * enough to replicate `salts` times.
  *
  * Mechanics: each probe-side row gets a deterministic salt from a
  * stable hash of a caller-supplied unique column, widening the hot key
  * into `salts` shuffle partitions; the build side is replicated once
  * per salt so every (key, salt) pair finds its match. Row-for-row
  * equal to the plain join (SkewJoinSpec proves it): each probe row
  * carries exactly one salt, so it meets exactly one copy of each
  * matching build row — multiplicities and left-outer nulls preserved.
  */
object SkewJoin {

  /** `probe ⋈ build` on `key` with the probe side salted. `saltBy`
    * must be a deterministic per-row expression on `probe` (ideally a
    * unique id) — it only spreads rows, never affects results. Only
    * "inner" and "left" are supported: replicating the build side
    * would duplicate its unmatched rows under right/full semantics. */
  def salted(probe: DataFrame, build: DataFrame, key: String, saltBy: Column,
             salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salted join supports inner/left only, got $joinType")
    val probeCols = probe.columns.toSeq
    val buildCols = build.columns.filterNot(_ == key).toSeq
    // the final positional select resolves columns by bare name, so a
    // non-key name shared by both sides would be ambiguous — enforce
    // the contract instead of failing analysis later (ADVICE r3 #4)
    val shared = probeCols.filterNot(_ == key).toSet.intersect(buildCols.toSet)
    require(shared.isEmpty,
      s"salted join requires disjoint non-key columns; shared: ${shared.mkString(", ")} " +
        "(alias/rename the build side before joining)")
    val sProbe = probe.withColumn("__salt", pmod(xxhash64(saltBy), lit(salts)))
    val sBuild = build.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    sProbe.join(sBuild, Seq(key, "__salt"), joinType)
      .select((key +: (probeCols.filterNot(_ == key) ++ buildCols)).map(col): _*)
  }
}
