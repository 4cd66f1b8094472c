package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic HyperLogLog distinct-count sketch (Flajolet et al.) —
  * the "novel sketch" custom-operator slot. Spark's own
  * `approx_count_distinct` is HLL++ whose hash (xxhash of the internal
  * binary encoding) no other engine reproduces, so it can never pass a
  * cross-engine differential gate. This sketch is built from the same
  * md5-derived 60-bit hash the dedup family uses — every intermediate
  * is INTEGER arithmetic both engines perform bit-identically:
  *
  *  - register index = hash % m (m = 2^P registers);
  *  - rho = position of the leading 1-bit in the remaining W-bit word
  *    (computed as W+1 − len(bin(w)) — string length of the binary
  *    form, exact in both engines — no floating log2);
  *  - per-register max(rho), then the harmonic term Σ 2^(−M_j) scaled
  *    by 2^(W+1) so it SUMS AS EXACT LONGS (every term ≤ 2^(W+1),
  *    m terms fit a signed 64-bit range) — the only doubles are one
  *    final division and, on the small-range linear-counting branch,
  *    one ln() quantized through decimal(18,9) (the bm25 idf recipe,
  *    since libm ln differs across engines in the last ulp).
  *
  * Scale: the sketch state is m longs per group — constant, mergeable,
  * shuffle-light (the groupBy carries (group, register) pairs, never
  * values). This is the shape that counts distincts over 100 TB in one
  * pass where exact countDistinct would shuffle every value.
  */
object Sketches {

  /** log2(registers): m = 64 — ±13% standard error, enough to
    * demonstrate the machinery while keeping the oracle SQL bounded. */
  val HllP = 6
  val HllM = 64
  /** Bits of the hash word the leading-1 scan runs over (60-bit hash
    * minus P index bits = 54). */
  val HllW: Int = 60 - HllP
  /** Bias correction alpha_64 (standard constant for m = 64). */
  val HllAlpha = 0.709

  /** Per-group HLL estimate ONLY — the corpus-grain path (no exact
    * countDistinct rides along, so no per-value shuffle and no Expand):
    * groupCols ++ (hll_estimate). The shuffle carries ≤ m register
    * rows per group. */
  def hllEstimateByGroup(df: DataFrame, groupCols: Seq[String], keyExpr: Column): DataFrame = {
    val h = graft.llm.Dedup.hex60(keyExpr)
    val gs = groupCols.map(col)
    // index = low P bits, word = the rest — integer ops only (a double
    // division would round a 60-bit hash past the 53-bit mantissa)
    val regs = df.select(gs :+ pmod(h, lit(HllM.toLong)).as("__reg") :+
      shiftright(h, HllP).as("__w"): _*)
      .withColumn("__rho",
        when(col("__w") === 0, lit(HllW + 1))
          .otherwise(lit(HllW + 1) - length(bin(col("__w")))))
    val perReg = regs.groupBy(gs :+ col("__reg"): _*)
      .agg(max(col("__rho")).as("__mj"))
    hllEstimateFromRegistersBy(perReg, groupCols)
  }

  /** Per-group estimate from a grouped register table
    * (groupCols ++ (__reg, __mj)) — the read path over STORED /
    * merged sketches; empty groupCols gives the one-row global
    * estimate. Same arithmetic as the object doc describes: exact
    * long harmonic sum, one final double division, quantized-ln
    * linear-counting branch. */
  def hllEstimateFromRegistersBy(perReg: DataFrame,
                                 groupCols: Seq[String]): DataFrame = {
    val gs = groupCols.map(col)
    // scaled harmonic term 2^(W+1-Mj): exact long arithmetic
    val summed = perReg.groupBy(gs: _*).agg(
      sum(expr(s"shiftleft(1L, ${HllW + 1} - __mj)")).as("__ssum"),
      count(lit(1)).as("__nreg"))
    val zeros = lit(HllM.toLong) - col("__nreg")
    val scaled = col("__ssum") + zeros * lit(1L << (HllW + 1))
    val rawEst = lit(HllAlpha * HllM * HllM) * lit(math.pow(2.0, HllW + 1)) /
      col("__scaled").cast("double")
    // ln through a decimal quantization so both engines' libm agree
    val linEst = (log(lit(HllM.toDouble) / zeros.cast("double")) * lit(HllM.toDouble))
      .cast(DecimalType(18, 9)).cast("double")
    summed.withColumn("__scaled", scaled)
      .withColumn("__raw", rawEst)
      .withColumn("hll_estimate",
        when(zeros > 0 && col("__raw") <= lit(2.5 * HllM), linEst)
          .otherwise(col("__raw")))
      .select(gs :+ col("hll_estimate"): _*)
  }

  /** Per-group HLL distinct estimate of `keyExpr` (a string column),
    * alongside the exact count for reference (audit grain — the exact
    * side shuffles values; at corpus grain use
    * [[hllEstimateByGroup]] alone). Output columns:
    * groupCols ++ (n_exact, hll_estimate). */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], keyExpr: Column): DataFrame = {
    val est = hllEstimateByGroup(df, groupCols, keyExpr)
    val exact = df.groupBy(groupCols.map(col): _*)
      .agg(countDistinct(keyExpr).as("n_exact"))
    exact.join(est, groupCols)
  }

  /** The property that makes sketches THE 100 TB distinct-count tool:
    * register tables MERGE by per-register max, so per-partition (here:
    * per-`partCol`-value) sketches built independently — different
    * executors, different ingest batches, different days — combine into
    * the global estimate without touching raw values again. This
    * operator materializes that path explicitly: per-partition register
    * tables (the "stored sketches"), a register-wise max merge, then
    * the standard estimator; `max` is associative/commutative, so the
    * merged registers equal the directly-built global sketch
    * bit-for-bit — exactly the equivalence the DuckDB oracle gates
    * (it builds the global sketch directly).
    *
    * Output: one row (n_sketches, n_exact, hll_estimate); the exact
    * global distinct rides along for error accounting. */
  /** The stored-sketch table: one (part, register, max-rho) row per
    * partition value — what a production pipeline PERSISTS per batch /
    * day / ingest so later distinct-count queries never rescan raw
    * events. ≤ m rows per partition value. */
  def hllRegisters(df: DataFrame, partExpr: Column, partName: String,
                   keyExpr: Column): DataFrame = {
    val h = graft.llm.Dedup.hex60(keyExpr)
    df.select(partExpr.as(partName),
        pmod(h, lit(HllM.toLong)).as("__reg"), shiftright(h, HllP).as("__w"))
      .withColumn("__rho",
        when(col("__w") === 0, lit(HllW + 1))
          .otherwise(lit(HllW + 1) - length(bin(col("__w")))))
      .groupBy(col(partName), col("__reg"))
      .agg(max(col("__rho")).as("__mj"))
  }

  /** One-row estimate from a merged `(__reg, __mj)` register table —
    * the standard HLL estimator with the quantized-ln linear-counting
    * branch (see object doc). */
  def hllEstimateFromRegisters(merged: DataFrame): DataFrame =
    hllEstimateFromRegistersBy(merged, Seq.empty)

  def hllMergedDistinct(df: DataFrame, partCol: String, keyExpr: Column): DataFrame = {
    // the per-partition sketches (≤ m rows each)...
    val perPart = hllRegisters(df, col(partCol), "__part", keyExpr)
    // ...and the merge: register-wise max across sketches.
    val merged = perPart.groupBy(col("__reg")).agg(max(col("__mj")).as("__mj"))
    df.agg(countDistinct(col(partCol)).as("n_sketches"),
        countDistinct(keyExpr).as("n_exact"))
      .crossJoin(broadcast(hllEstimateFromRegisters(merged)))
  }

  // ---- Count-Min Sketch (Cormode & Muthukrishnan) ----

  /** Depth: independent hash rows. */
  val CmsD = 4
  /** Width: counters per row. */
  val CmsWidth = 256L
  val CmsSalt = "cms"
  /** Heavy-hitter cutoff for the registered `cms_heavy_hitters` query
    * (the corpus token counts span ~26..~1000, so 500 filters). */
  val CmsHeavyThreshold = 500L

  /** Heavy hitters over a key column via a deterministic Count-Min
    * Sketch: d salted md5-60 hash rows × w counters; a key's estimate
    * is the MIN over its d counters — an upper bound on the true count
    * (collisions only ever inflate). Same cross-engine-determinism
    * recipe as [[hllDistinct]]: Spark's own CountMinSketch aggregate
    * hashes with xxhash over internal encodings no other engine
    * reproduces, while this one is pure integer arithmetic over the
    * shared md5 primitive.
    *
    * Scale: the sketch state is d×w longs TOTAL (the groupBy carries
    * (row, bucket) pairs bounded by d×w, with map-side partial
    * combine), so frequency estimation over 100 TB of keys shuffles a
    * constant-size table. The probe side here is EVERY distinct key
    * (the exact count rides along for error accounting, so the
    * distinct aggregate is paid anyway and the tiny counter table
    * broadcasts); a pure production sketch would probe only candidate
    * keys and skip the exact pass entirely.
    *
    * Output: (key AS `keyName`, n_exact, cms_estimate) for keys whose
    * ESTIMATE ≥ threshold (the CMS decision rule — no false negatives:
    * est ≥ true count, so every truly-heavy key is reported). */
  private def cmsHashRow(r: Int, k: Column): Column =
    pmod(graft.llm.Dedup.hex60(concat(lit(s"$CmsSalt$r|"), k)), lit(CmsWidth))

  /** The (r, bkt, cnt) counter table of a keyed input — one pass:
    * each key contributes to d counters (explode of a d-element
    * literal-built array, then ONE partial-combined agg). Counters
    * over disjoint inputs MERGE BY ADDITION, so per-batch/per-day
    * counter tables sum to exactly the directly-built global table —
    * the CMS mergeability the streaming twin rides. */
  def cmsCounters(keyed: DataFrame, keyName: String): DataFrame =
    keyed.select(col(keyName), explode(array(
        (0 until CmsD).map(r => struct(lit(r).as("r"),
          cmsHashRow(r, col(keyName)).as("bkt"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bkt").as("bkt"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-query the counter table with every distinct key of `keyed`
    * (exact count riding along for error accounting), keeping keys
    * whose min-over-rows estimate reaches `threshold`. The counter
    * side is ≤ d×w rows — broadcast. */
  def cmsProbeHeavy(keyed: DataFrame, counters: DataFrame,
                    keyName: String, threshold: Long): DataFrame = {
    val exact = keyed.groupBy(keyName).agg(count(lit(1)).as("n_exact"))
    val probes = exact.select(col(keyName), col("n_exact"), explode(array(
      (0 until CmsD).map(r => struct(lit(r).as("r"),
        cmsHashRow(r, col(keyName)).as("bkt"))): _*)).as("rb"))
      .select(col(keyName), col("n_exact"),
        col("rb.r").as("r"), col("rb.bkt").as("bkt"))
    probes.join(broadcast(counters), Seq("r", "bkt"))
      .groupBy(col(keyName), col("n_exact"))
      .agg(min("cnt").as("cms_estimate"))
      .filter(col("cms_estimate") >= threshold)
  }

  def cmsHeavyHitters(df: DataFrame, keyCol: Column, keyName: String,
                      threshold: Long): DataFrame = {
    val keyed = df.select(keyCol.cast("string").as(keyName))
    cmsProbeHeavy(keyed, cmsCounters(keyed, keyName), keyName, threshold)
  }

  /** JOIN-SIZE ESTIMATION from two Count-Min counter tables — the
    * sketch inner product (Cormode & Muthukrishnan 2005, §4.2): for
    * each of the d rows, Σ_bucket cntA·cntB overestimates the true
    * join cardinality Σ_key cA(k)·cB(k) (collisions only ever ADD
    * cross terms), and the min over rows is the estimate — the
    * cardinality-estimation primitive an optimizer consults before
    * choosing a join strategy, here priced against the exact answer.
    *
    * Determinism: every count is an exact integer; rel_err is ONE
    * IEEE division of exact ints.
    *
    * Scale: each side is sketched in one pass into a ≤ d×w counter
    * table (constant-size shuffle regardless of input), the inner
    * product joins two constant-size tables — the estimate NEVER
    * executes the join. The exact side (key-counts join) rides along
    * only because this operator's contract is to price the sketch;
    * production consults the sketch alone. */
  def joinSizeEstimate(a: DataFrame, b: DataFrame, keyName: String): DataFrame = {
    val ka = a.select(col(keyName).cast("string").as(keyName))
    val kb = b.select(col(keyName).cast("string").as(keyName))
    val est = cmsCounters(ka, keyName)
      .join(cmsCounters(kb, keyName).withColumnRenamed("cnt", "cnt_b"),
        Seq("r", "bkt"))
      .groupBy(col("r")).agg(sum(col("cnt") * col("cnt_b")).as("row_est"))
      .agg(min(col("row_est")).as("est_pairs"))
    val ea = ka.groupBy(keyName).agg(count(lit(1)).as("ca"))
    val eb = kb.groupBy(keyName).agg(count(lit(1)).as("cb"))
    val exact = ea.join(eb, Seq(keyName))
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("true_pairs"),
        count(lit(1)).as("n_shared_keys"))
    exact.crossJoin(broadcast(est))
      .select(col("n_shared_keys"), col("true_pairs"), col("est_pairs"),
        when(col("true_pairs") > 0,
          (col("est_pairs") - col("true_pairs")).cast("double")
            / col("true_pairs").cast("double"))
          .otherwise(lit(0.0)).as("rel_err"))
  }

  // ---- Histogram quantile sketch ----

  /** Equi-width bins per group. */
  val HistBins = 256

  /** Quantiles reported by the registered `hist_quantiles` query. */
  val HistQs: Seq[Double] = Seq(0.5, 0.9, 0.99)

  /** Approximate per-group quantiles from a fixed-width histogram —
    * the one-pass-shape quantile for data that cannot be sorted:
    * exact `percentile` globally sorts every value per group, while
    * the histogram shuffles at most `groupCols × HistBins` counter
    * rows regardless of input size, and two histograms over disjoint
    * data MERGE by adding counters (incremental/streaming friendly).
    *
    * Estimate: target rank `ceil(q·n)` lands in the first bin whose
    * cumulative count reaches it; linear interpolation inside the bin
    * gives `vmin + width·(bin + (target − cum_before)/bin_count)`.
    * Every operation is IEEE +,−,×,÷ (no libm), so Spark and the
    * DuckDB oracle produce bit-identical doubles.
    *
    * The per-group (min, max, n) pre-pass is itself one bounded
    * aggregation; the bin-cumulative window partitions by group over
    * ≤ HistBins rows. Output: one row per group × quantile:
    * (groupCols…, q, n, est). */
  def histogramQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                         qs: Seq[Double] = HistQs): DataFrame = {
    // NULL values are excluded up front, matching count(valueCol) /
    // percentile semantics — without the filter, floor(null/width) is
    // null and least() (which SKIPS nulls, both engines) would bin
    // every null row into the TOP bin, silently diluting high
    // quantiles.
    val nonNull = df.filter(valueCol.isNotNull)
    val stats = histStats(nonNull, groupCols, valueCol)
    histQuantilesFromBins(histBinCounts(nonNull, groupCols, valueCol, stats),
      stats, groupCols, qs)
  }

  /** Per-group bin-edge stats (__vmin, __vmax, __n, __width) — the
    * quantizer the bin counters are defined against. The streaming
    * twin PINS this table from the standing corpus so per-batch
    * counters stay merge-compatible. Callers pass NULL-FILTERED input.
    * No broadcast hint: Catalyst broadcasts small group counts on its
    * own, and a hint would force a driver-side collect of |groups|
    * rows — a ceiling a generic operator must not impose (the
    * hllDistinct convention). */
  def histStats(nonNull: DataFrame, groupCols: Seq[String],
                valueCol: Column): DataFrame =
    nonNull.groupBy(groupCols.map(col): _*).agg(
      min(valueCol).as("__vmin"), max(valueCol).as("__vmax"),
      count(valueCol).as("__n"))
      .withColumn("__width",
        (col("__vmax") - col("__vmin")) / lit(HistBins.toDouble))

  /** The (group…, __bin, __cnt) counter table against a given stats
    * (quantizer) table. Counters over disjoint inputs MERGE BY
    * ADDITION when built against the SAME stats — per-batch tables
    * sum to exactly the directly-built global table, the mergeability
    * the streaming twin rides (the cmsCounters convention). Values
    * outside the pinned [vmin, vmax] clamp into the edge bins (least
    * + the floor of a negative offset), so a drifted tail is counted,
    * not dropped. */
  def histBinCounts(nonNull: DataFrame, groupCols: Seq[String],
                    valueCol: Column, stats: DataFrame): DataFrame = {
    val gs = groupCols.map(col)
    nonNull.select(gs :+ valueCol.as("__v"): _*)
      .join(stats.select((gs :+ col("__vmin") :+ col("__width")): _*), groupCols)
      .withColumn("__bin",
        when(col("__width") === 0.0, lit(0L)) // constant group: one bin
          .otherwise(least(lit(HistBins - 1L), greatest(lit(0L),
            floor((col("__v") - col("__vmin")) / col("__width"))))))
      .groupBy(gs :+ col("__bin"): _*)
      .agg(count(lit(1)).as("__cnt"))
  }

  /** Quantile estimates from a (group…, __bin, __cnt) counter table
    * plus its stats (quantizer) table. `__n` is derived FROM THE
    * COUNTERS (full-partition window sum over ≤ HistBins rows), not
    * from stats — so a merged-counter caller that lost a batch shifts
    * both n and every estimate, and the oracle gate catches it. */
  def histQuantilesFromBins(bins: DataFrame, stats: DataFrame,
                            groupCols: Seq[String],
                            qs: Seq[Double] = HistQs): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), "quantiles in (0, 1]")
    val gs = groupCols.map(col)
    val df = bins
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*).orderBy(col("__bin"))
    val winAll = org.apache.spark.sql.expressions.Window.partitionBy(gs: _*)
    val cum = bins
      .withColumn("__cum", sum("__cnt").over(win))
      .withColumn("__cum_before", col("__cum") - col("__cnt"))
      .withColumn("__n", sum("__cnt").over(winAll))
      .join(stats.select((gs :+ col("__vmin") :+ col("__width")): _*), groupCols)
    val qDf = {
      import scala.jdk.CollectionConverters._
      df.sparkSession.createDataFrame(
        qs.map(org.apache.spark.sql.Row(_)).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("q",
            org.apache.spark.sql.types.DoubleType, nullable = false))))
    }
    val target = greatest(lit(1L), ceil(col("q") * col("__n").cast("double")).cast("long"))
    cum.crossJoin(broadcast(qDf))
      .withColumn("__target", target)
      // exactly one bin per (group, q): the first whose cum reaches it
      .filter(col("__cum_before") < col("__target") &&
        col("__cum") >= col("__target"))
      .select(gs ++ Seq(
        col("q"),
        col("__n").as("n"),
        when(col("__width") === 0.0, col("__vmin"))
          .otherwise(col("__vmin") + col("__width") *
            (col("__bin").cast("double") +
              (col("__target") - col("__cum_before")).cast("double") /
                col("__cnt").cast("double"))).as("est")): _*)
  }
}
