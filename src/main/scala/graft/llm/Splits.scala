package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the holdout assignment every
  * training-data pipeline needs before anything is trained.
  *
  * Assignment is a pure function of the stable document id (a salted
  * 60-bit md5 bucket in 0..99), so it is:
  *  - reproducible across runs, engines, and cluster sizes (no RNG, no
  *    partition dependence — the property `sample()` does NOT give);
  *  - stable under corpus growth: adding documents never moves an
  *    existing document between splits (the classic leakage bug with
  *    `row_number % 100` schemes, where one insertion reshuffles every
  *    split downstream);
  *  - exactly mirrorable in SQL for the oracle gate.
  *
  * At 100 TB: a projection — no shuffle, no state; the salt keeps the
  * split uncorrelated with any other hash-derived bucketing in the
  * pipeline (dedup bands, LSH buckets) built on the same md5 primitive.
  */
object Splits {

  val TrainPct = 90
  val ValidationPct = 5 // test = remainder

  val Salt = "split|"

  /** THE salted-hash-bucket device, defined once: every deterministic
    * sampling/assignment decision in the pipeline (splits, stratified
    * sampling, mixture rebalancing) is `md5-60(salt || id) mod m`, and
    * every DuckDB oracle mirrors exactly this shape — keeping the
    * salt-format/cast/pmod contract in one place so a change cannot
    * silently miss a copy and break oracle parity. */
  def saltedBucket(salt: String, id: Column, mod: Long): Column =
    pmod(Dedup.hex60(concat(lit(salt), id.cast("string"))), lit(mod))

  /** 0..99 split bucket for an id column. */
  def bucket(id: Column): Column = saltedBucket(Salt, id, 100L)

  /** (doc_id, bucket, split) with train/validation/test labels. */
  def assign(documents: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val b = bucket(col(idCol))
    documents.select(
      col(idCol),
      b.as("bucket"),
      when(b < TrainPct, lit("train"))
        .when(b < TrainPct + ValidationPct, lit("validation"))
        .otherwise(lit("test")).as("split"))
  }

  val SampleSalt = "smp|"

  /** Deterministic STRATIFIED sampling: keep `fractions(stratum)` % of
    * each stratum (unlisted strata keep everything), decided by the
    * same salted-hash-bucket device as [[assign]] — so the sample is
    * reproducible, growth-stable, engine-mirrorable, and a pure
    * projection+filter at any scale. The standard rebalancing pass of
    * a training-data pipeline: downsample the over-represented strata
    * (boilerplate languages, crawl duplicates' sources) without an RNG
    * whose draw depends on partitioning. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Int]): DataFrame = {
    require(fractions.values.forall(p => p >= 0 && p <= 100),
      "fractions are percentages in 0..100")
    val b = saltedBucket(SampleSalt, col(idCol), 100L)
    val keepPct = fractions.foldLeft(lit(100): Column) { case (acc, (s, p)) =>
      when(col(strataCol) === s, lit(p)).otherwise(acc)
    }
    df.withColumn("sample_bucket", b).filter(col("sample_bucket") < keepPct)
  }

  val WeightedSalt = "wsmp|"
  val WeightedK = 20

  /** Deterministic WEIGHTED sampling without replacement
    * (Efraimidis–Spirakis A-ES): each row's priority is
    * `ln(u) / w` with `u = (md5-60(salt‖id) + 1) / 2^60` — a pure
    * function of the id, so the top-k by priority per stratum is the
    * exact weighted sample u^(1/w) would select, reproducible across
    * runs and engines. Selection runs through the bounded-heap
    * [[graft.expressions.TopKAggregate]] (k entries per stratum per
    * map task cross the exchange, not every row); the payload struct
    * carries (doc_id, n_chars) so ONE corpus scan suffices — doc_id is
    * unique and leads the struct's lexicographic order, so ties break
    * exactly like the oracle's `priority desc, doc_id` (review r6:
    * the join-back formulation scanned documents twice).
    *
    * The pretraining use: length-weighted document sampling — longer
    * documents carry more tokens, so token-budget sampling weights by
    * `n_chars`, not uniformly.
    */
  def weightedSample(documents: DataFrame, strataCol: String = "source",
                     k: Int = WeightedK): DataFrame = {
    val u = (Dedup.hex60(concat(lit(WeightedSalt), col("doc_id").cast("string")))
      .cast("double") + lit(1.0)) / lit(1152921504606846976.0) // 2^60
    val w = greatest(col("n_chars"), lit(1L)).cast("double")
    documents
      .select(col(strataCol),
        struct(col("doc_id"), col("n_chars")).as("pay"),
        (log(u) / w).as("priority"))
      .groupBy(col(strataCol))
      .agg(graft.expressions.TopKAggregate
        .top_k(col("priority"), col("pay"), k).as("tk"))
      .select(col(strataCol), posexplode(col("tk")))
      .select(col(strataCol), (col("pos") + 1).cast("int").as("rank"),
        col("col.payload.doc_id").as("doc_id"),
        col("col.payload.n_chars").as("n_chars"))
  }

  val SplitNames: Seq[String] = Seq("train", "validation", "test")

  /** Cross-GROUP duplication matrix for a DYNAMIC group column (the
    * [[leakageAudit]] arithmetic without a fixed group list): one row
    * per observed group pair (a < b) with the cross-group near-dup
    * pair count Σ nₐ·n_b and the affected-cluster count. The
    * per-cluster group-count table joins itself on cluster_id — fan-out
    * is |groups-present-in-cluster|², bounded by the group domain (20
    * sources here), never by cluster size. Used for the
    * "which sources copy from each other" contamination matrix. */
  def crossGroupDupMatrix(clusters: DataFrame, assign: DataFrame,
                          groupCol: String): DataFrame = {
    val joined = clusters.select(col("doc_id"), col("cluster_id"))
      .join(assign.select(col("doc_id"), col(groupCol).as("g")), Seq("doc_id"))
    val cnt = joined.groupBy("cluster_id", "g").agg(count(lit(1)).as("n"))
    val a = cnt.as("a"); val b = cnt.as("b")
    a.join(b, col("a.cluster_id") === col("b.cluster_id") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as(s"${groupCol}_a"), col("b.g").as(s"${groupCol}_b"))
      .agg(sum(col("a.n") * col("b.n")).as("n_dup_pairs"),
        count(lit(1)).as("n_clusters"))
  }

  /** Train/test LEAKAGE audit — near-duplicate pairs that STRADDLE a
    * split boundary (a test doc with a near-dup in train invalidates
    * the eval; this cross-split count is the number every lab checks
    * before trusting held-out metrics). Composes the transitive
    * near-dup clusters with the split assignment; pair counts are
    * computed ARITHMETICALLY from per-(cluster, split) member counts
    * (Σ over clusters of nₐ·n_b) — no within-cluster self-join, so a
    * pathological mega-cluster costs one aggregation row, never a
    * quadratic pair expansion. Output: one row per split pair. */
  def leakageAudit(clusters: DataFrame, splits: DataFrame): DataFrame = {
    val joined = clusters.select(col("doc_id"), col("cluster_id"))
      .join(splits.select(col("doc_id"), col("split")), Seq("doc_id"))
    val cnts = SplitNames.map(sp =>
      count(when(col("split") === sp, lit(1))).as(s"n_$sp"))
    val perCluster = joined.groupBy("cluster_id").agg(cnts.head, cnts.tail: _*)
    val pairs = SplitNames.combinations(2).toSeq
    pairs.map { case Seq(a, b) =>
      perCluster.agg(
          coalesce(sum(col(s"n_$a") * col(s"n_$b")), lit(0L)).as("n_leaky_pairs"),
          count(when(col(s"n_$a") > 0 && col(s"n_$b") > 0, lit(1)))
            .as("n_clusters"))
        .select(lit(a).as("split_a"), lit(b).as("split_b"),
          col("n_leaky_pairs"), col("n_clusters"))
    }.reduce(_ unionByName _)
  }

  /** Total sample budget [[neymanAllocation]] distributes. */
  val NeymanBudget = 1000L

  /** NEYMAN OPTIMAL ALLOCATION (Neyman 1934) of a fixed sample budget
    * across language strata — the sampling DESIGN step the stratified
    * sampler above executes: to estimate mean document length with
    * minimum variance, stratum h gets n_h ∝ N_h·S_h (big AND variable
    * strata get more), vs proportional allocation's n_h ∝ N_h. Both
    * allocations are reported per stratum, with the two design
    * variances (V = (Σ WₕSₕ)²/n for Neyman, Σ WₕSₕ²/n for
    * proportional) so the design effect is read directly — an eval-set
    * builder runs THIS before burning label budget.
    *
    * Integerization is LARGEST-REMAINDER (floor the exact shares,
    * hand the leftover to the largest fractional remainders,
    * remainder-desc / lang-asc tiebreak), so the allocations sum to
    * the budget EXACTLY on both engines.
    *
    * Determinism: per-stratum moments are exact decimal sums; S_h
    * comes from [[graft.functions.Funcs.stddevFromSums]]' string-cast
    * double contract; the cross-strata Σ N_h·S_h folds doubles in
    * LANG ORDER through one sorted-array `aggregate` (an unordered
    * float SUM over the group would be partition-order-dependent —
    * the bm25 fixed-order lesson). Scale: one corpus aggregation to
    * |strata| rows; everything after (windows included) runs on the
    * language dimension — bounded, the W3 exception. */
  def neymanAllocation(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val strata = documents
      .select(col("lang"), col("n_chars").cast(DecimalType(19, 0)).as("x"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_pop"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sx2"))
      // a singleton stratum has no sample stddev (stddevFromSums is
      // NULL at n=1) — treat it as zero-variance so it draws zero
      // Neyman budget instead of NULL-poisoning the lang-ordered
      // t_nhsh fold and with it EVERY stratum's allocation (ADVICE r15)
      .withColumn("sd",
        coalesce(graft.functions.Funcs.stddevFromSums(col("sx"), col("sx2"),
          col("n_pop")), lit(0.0)))
      .withColumn("nh_sh", col("n_pop").cast("double") * col("sd"))
      .withColumn("nh_sh2",
        col("n_pop").cast("double") * col("sd") * col("sd"))
    // lang-ordered folds for every cross-strata float total
    val totals = strata
      .agg(array_sort(collect_list(struct(col("lang"), col("nh_sh"),
          col("nh_sh2")))).as("a"),
        sum(col("n_pop")).as("n_total"))
      .select(col("n_total"),
        expr("aggregate(a, 0.0d, (acc, x) -> acc + x.nh_sh)").as("t_nhsh"),
        expr("aggregate(a, 0.0d, (acc, x) -> acc + x.nh_sh2)").as("t_nhsh2"))
    val w = org.apache.spark.sql.expressions.Window
    val exact = strata.crossJoin(broadcast(totals))
      .withColumn("exact_ney",
        lit(NeymanBudget.toDouble) * col("nh_sh") / col("t_nhsh"))
      .withColumn("exact_prop",
        lit(NeymanBudget.toDouble) * col("n_pop").cast("double")
          / col("n_total").cast("double"))
      .withColumn("base_ney", floor(col("exact_ney")).cast("long"))
      .withColumn("base_prop", floor(col("exact_prop")).cast("long"))
    // leftover + remainder ranks as windows over the |strata| rows
    // (bounded dim — the W3 exception), not re-aggregating the chain
    def remainderRound(df: DataFrame, exactCol: String, baseCol: String,
                       outCol: String): DataFrame =
      df.withColumn("__r", row_number().over(
          graft.operators.BoundedWindow
            .orderBy((col(exactCol) - col(baseCol)).desc, col("lang").asc)))
        .withColumn("__left",
          lit(NeymanBudget) - sum(col(baseCol)).over(
            graft.operators.BoundedWindow.all))
        .withColumn(outCol,
          col(baseCol) + when(col("__r") <= col("__left"), 1L).otherwise(0L))
        .drop("__r", "__left")
    val alloc = remainderRound(
      remainderRound(exact, "exact_ney", "base_ney", "n_neyman"),
      "exact_prop", "base_prop", "n_prop")
    alloc.select(col("lang"), col("n_pop"), col("sd").as("sd_chars"),
      col("n_prop"), col("n_neyman"),
      (col("t_nhsh") / col("n_total").cast("double")
        * col("t_nhsh") / col("n_total").cast("double")
        / lit(NeymanBudget.toDouble)).as("v_neyman"),
      (col("t_nhsh2") / col("n_total").cast("double")
        / lit(NeymanBudget.toDouble)).as("v_prop"))
  }
}
