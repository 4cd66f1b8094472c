package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-arithmetic Pearson CORRELATION MATRIX over cent-scaled money
  * columns — the numeric-profiling companion to [[Profile]]: which
  * measures move together is the first question asked of any new fact
  * table, and Spark's own `corr` is a streaming float fold whose
  * result depends on partition/merge order, so it can never pass a
  * cross-engine differential gate.
  *
  * Recipe (the A16 stddev pattern generalized to co-moments): each
  * decimal(·,2) column becomes its exact unscaled cents as
  * decimal(19,0) — forcing int128 lanes in DuckDB, where a width-≤18
  * multiply overflows int64 — and ONE pass accumulates every Σx, Σx²,
  * and pairwise Σxy exactly (products are decimal(38,0); sums cap at
  * precision 38 with scale 0, so there is no silent scale-rounding —
  * magnitudes up to ~1e38 are exact). Pearson then comes from the
  * textbook moment identity with the three casts to double as the
  * ONLY floating steps: corr = (nΣxy − ΣxΣy) / √((nΣx² − (Σx)²) ·
  * (nΣy² − (Σy)²)) — one division, one multiply, one sqrt, all
  * correctly-rounded IEEE ops both engines perform identically.
  *
  * Scale: a single map-side-combined aggregation over one scan —
  * k + k(k+1)/2 long/decimal accumulators cross the shuffle, never
  * values; the pair rows are projections of the ONE resulting stats
  * row. Rows with any null measure are excluded (both engines filter
  * identically) so every moment sees the same support.
  */
object Stats {

  /** (col_x, col_y, n, corr) for every unordered column pair. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val cents = df
      .filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .select(cols.map(c =>
        (col(c) * 100).cast("decimal(19,0)").as(c)): _*)
    val aggs =
      count(lit(1)).as("n") +:
        (cols.flatMap(c => Seq(
          sum(col(c)).as(s"s_$c"),
          sum(col(c) * col(c)).as(s"ss_$c"))) ++
          pairs.map { case (a, b) =>
            sum(col(a) * col(b)).as(s"sp_${a}_$b") })
    val stats = cents.agg(aggs.head, aggs.tail: _*)
    def corrOf(a: String, b: String): Column = {
      val num = (col("n") * col(s"sp_${a}_$b") -
        col(s"s_$a") * col(s"s_$b")).cast("double")
      val dx = (col("n") * col(s"ss_$a") -
        col(s"s_$a") * col(s"s_$a")).cast("double")
      val dy = (col("n") * col(s"ss_$b") -
        col(s"s_$b") * col(s"s_$b")).cast("double")
      num / sqrt(dx * dy)
    }
    pairs.map { case (a, b) =>
      stats.select(lit(a).as("col_x"), lit(b).as("col_y"),
        col("n"), corrOf(a, b).as("corr"))
    }.reduce(_ unionByName _)
  }

  /** JOIN-KEY SKEW PROFILE — the pre-flight check before choosing a
    * join/partitioning strategy for a key ([[SkewJoin]] salting, AQE
    * skew thresholds, bucket counts): per-key row counts reduced to
    * one row of distribution shape — key/row totals, min/max,
    * interpolated count percentiles (through the decimal(18,9)
    * quantization the percentile family uses, absorbing last-ulp
    * interpolation divergence), and `skew_ratio` = max/mean — 1.0 is
    * perfectly uniform; the classic salt-or-broadcast trigger is
    * ratio ≫ 1 with a fat p99.
    *
    * Scale: one map-side-combined count per key (the groupBy every
    * join on this key pays anyway), then a single-row global rollup
    * over |keys| counts. The global percentile sorts one long per
    * key — the [[graft.marts.EventMarts.valuePercentiles]] trade,
    * acceptable because the profile input is already key-grain. */
  /** PSI bin count (the industry-standard 10–20 band) and the
    * conventional "significant shift" threshold. */
  val PsiBins = 16
  val PsiThreshold = 0.25

  /** FEATURE-DRIFT detection via the Population Stability Index — the
    * monitoring primitive every production training pipeline runs
    * between a reference window and the current one: per event_type,
    * `value`'s distribution in the EARLIEST calendar month (the
    * reference the model was trained/calibrated against) is compared
    * to the LATEST month, PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i) with
    * Laplace-smoothed bin shares p_i = (c_ref_i+1)/(n_ref+B). Bin
    * edges are pinned from the REFERENCE side (the monitoring
    * convention — current data is quantized by the reference's
    * quantizer) and out-of-range current values clamp into the edge
    * bins, so a drifted tail is counted, not dropped. Event types
    * absent from the reference month have no reference quantizer and
    * are excluded (inner join) — PSI is undefined without a baseline.
    *
    * Cross-engine determinism: every bin share is exact-integer
    * rational — (c+1)·(n'+B) products stay in int64 to ~3e9 rows/side
    * — so p−q and the ln argument each take exactly ONE IEEE
    * division; the ln (the only libm call) is quantized through
    * decimal(18,9) (the HLL linear-counting recipe), the difference
    * through decimal(18,12), and their product is summed EXACTLY in
    * the decimal domain — no double is ever summed, so partition
    * order cannot move the result.
    *
    * Scale: one bounded aggregation per side (groups × B counter
    * rows), a broadcast bin spine (so empty bins still contribute
    * their smoothed terms), and a ≤ groups-row rollup — nothing
    * touches raw values twice. */
  def featureDriftPsi(events: DataFrame, bins: Int = PsiBins,
                      threshold: Double = PsiThreshold): DataFrame = {
    val pinned = psiPinnedStats(events, bins)
    psiFromCounts(psiBinCounts(events, pinned, bins), pinned, bins, threshold)
  }

  /** The PSI quantizer: one row per reference-month event_type —
    * (event_type, __vmin, __width, __ref_m, __cur_m). The streaming
    * monitor PINS this table (the standing-quantizer convention) so
    * per-batch counters stay merge-compatible; in production it is
    * the training-time snapshot the monitor compares against. */
  def psiPinnedStats(events: DataFrame, bins: Int = PsiBins): DataFrame = {
    val ev = events.filter(col("value").isNotNull)
      .select(col("event_type"), col("value"),
        date_trunc("month", col("ts")).as("__m"))
    val boundsDf = ev.agg(min("__m").as("__ref_m"), max("__m").as("__cur_m"))
    ev.crossJoin(broadcast(boundsDf))
      .filter(col("__m") === col("__ref_m"))
      .groupBy("event_type")
      .agg(min("value").as("__vmin"), max("value").as("__vmax"),
        first(col("__ref_m")).as("__ref_m"), first(col("__cur_m")).as("__cur_m"))
      .withColumn("__width",
        (col("__vmax") - col("__vmin")) / lit(bins.toDouble))
  }

  /** The (event_type, __bin, __cr, __cc) counter table of an input
    * slice against a pinned quantizer — counters over disjoint inputs
    * MERGE BY ADDITION (both columns), the mergeability the streaming
    * monitor rides. Types absent from the quantizer drop (inner
    * join); rows outside both pinned months drop (side filter). */
  def psiBinCounts(events: DataFrame, pinned: DataFrame,
                   bins: Int = PsiBins): DataFrame = {
    val ev = events.filter(col("value").isNotNull)
      .select(col("event_type"), col("value"),
        date_trunc("month", col("ts")).as("__m"))
    ev.join(pinned, "event_type")
      .withColumn("__side",
        when(col("__m") === col("__ref_m"), lit("ref"))
          .when(col("__m") === col("__cur_m"), lit("cur")))
      .filter(col("__side").isNotNull)
      .withColumn("__bin",
        when(col("__width") === 0.0, lit(0L))
          .otherwise(least(lit(bins - 1L), greatest(lit(0L),
            floor((col("value") - col("__vmin")) / col("__width"))))))
      .groupBy(col("event_type"), col("__bin"))
      .agg(count(when(col("__side") === "ref", lit(1))).as("__cr"),
        count(when(col("__side") === "cur", lit(1))).as("__cc"))
  }

  /** PSI per event_type from a (event_type, __bin, __cr, __cc)
    * counter table (direct or merged) — the serving read. */
  def psiFromCounts(counts: DataFrame, pinned: DataFrame,
                    bins: Int = PsiBins,
                    threshold: Double = PsiThreshold): DataFrame = {
    val spark = counts.sparkSession
    val refStats = pinned
    val binSpine = {
      import scala.jdk.CollectionConverters._
      val rows = (0 until bins).map(b =>
        org.apache.spark.sql.Row(b.toLong)).asJava
      refStats.select("event_type").crossJoin(broadcast(
        spark.createDataFrame(rows,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("__bin",
              org.apache.spark.sql.types.LongType, nullable = false))))))
    }
    val full = binSpine.join(counts, Seq("event_type", "__bin"), "left")
      .select(col("event_type"), col("__bin"),
        coalesce(col("__cr"), lit(0L)).as("__cr"),
        coalesce(col("__cc"), lit(0L)).as("__cc"))
    val tot = full.groupBy("event_type")
      .agg(sum("__cr").as("__nr"), sum("__cc").as("__nc"))
    val b = lit(bins.toLong)
    // Each factor quantizes to an exact INTEGER micro-unit (diff at
    // 1e-9, ln at 1e-6 — round() is half-away-from-zero in both
    // engines), the term product and the per-group sum stay in int64
    // (|diff_i| ≤ 1e9, |ln_i| ≤ ~3e7 → |Σ| ≲ 5e17 < 2^63), and ONE
    // int→double conversion + ONE IEEE division produce the double
    // PSI — decimals never appear, so neither engine's decimal
    // rescale rules (Spark rounds, DuckDB truncates) can disagree.
    val terms = full.join(tot, "event_type")
      .withColumn("__diff_i", round(
        (((col("__cr") + 1) * (col("__nc") + b) -
          (col("__cc") + 1) * (col("__nr") + b)).cast("double") /
          ((col("__nr") + b) * (col("__nc") + b)).cast("double")) *
          lit(1e9)).cast("long"))
      .withColumn("__ln_i", round(
        log(((col("__cr") + 1) * (col("__nc") + b)).cast("double") /
          ((col("__cc") + 1) * (col("__nr") + b)).cast("double")) *
          lit(1e6)).cast("long"))
      .withColumn("__term_i", col("__diff_i") * col("__ln_i"))
    terms.groupBy("event_type").agg(
        max(col("__nr")).as("n_ref"),
        max(col("__nc")).as("n_cur"),
        sum(col("__term_i")).as("__psi_i"))
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        (col("__psi_i").cast("double") / lit(1e15)).as("psi"),
        (col("__psi_i").cast("double") / lit(1e15) > lit(threshold))
          .as("drift_flag"))
  }

  def keySkewProfile(df: DataFrame, keyCol: String): DataFrame = {
    def q(c: Column) = c.cast(DecimalType(18, 9)).cast("double")
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("__c"))
    counts.agg(
        count(lit(1)).as("n_keys"),
        sum("__c").as("n_rows"),
        min("__c").as("min_count"),
        max("__c").as("max_count"),
        expr("percentile(__c, array(0.5D, 0.9D, 0.99D))").as("__p"))
      .select(col("n_keys"), col("n_rows").cast("long").as("n_rows"),
        col("min_count"), col("max_count"),
        q(element_at(col("__p"), 1)).as("p50_count"),
        q(element_at(col("__p"), 2)).as("p90_count"),
        q(element_at(col("__p"), 3)).as("p99_count"),
        ((col("max_count") * col("n_keys")).cast("double") /
          col("n_rows").cast("double")).as("skew_ratio"))
  }
}
