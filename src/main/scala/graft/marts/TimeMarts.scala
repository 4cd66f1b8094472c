package graft.marts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType
import graft.functions.Funcs._
import graft.operators.BoundedWindow

/** Time marts (SURVEY §2 S7, A6-A11, W5, J17, P5, F2-F5; reference
  * `models/marts/{metricflow_time_spine,time_analytics}.sql`).
  *
  * The reference's time_analytics computes weekly/monthly/cohort/
  * seasonal/growth CTEs but its final select only emits the daily
  * spine join (`time_analytics.sql:149-179`) — a warehouse prunes the
  * dead CTEs. Here each analysis is its own function, registered as its
  * own driver-verified query, so every operator gets an oracle entry.
  */
object TimeMarts {

  /** S7 date-spine generator (reference `metricflow_time_spine.sql:4-17`:
    * 3650 consecutive days ending "today" = the pinned RunDate).
    * `sequence` + `explode` — Catalyst's Generator, fully distributed-
    * planable; 3650 rows regardless of SF.
    */
  def timeSpine(spark: SparkSession): DataFrame =
    spark.range(1).select(
      explode(sequence(date_sub(runDate, 3649), runDate)).as("date_day"))

  /** A6 daily summary: conditional distinct counts + conditional sums
    * (reference `time_analytics.sql:15-37`). Money stays decimal here —
    * time_analytics consumes it exactly.
    */
  def dailySummary(orders: DataFrame): DataFrame =
    orders.groupBy(col("ordered_at").as("order_date"))
      .agg(
        countDistinct(col("order_id")).as("daily_orders"),
        countDistinct(col("customer_id")).as("daily_unique_customers"),
        dec18(sum(col("order_total"))).as("rev_d"),
        dec18(sum(col("order_cost"))).as("cost_d"),
        count(col("order_id")).as("n"),
        countDistinct(when(col("customer_order_number") === 1, col("customer_id"))).as("daily_new_customers"),
        countDistinct(when(col("customer_order_number") > 1, col("customer_id"))).as("daily_returning_customers"),
        count(when(col("is_promo_order"), lit(1))).as("daily_promo_orders"),
        count(when(col("has_returned_item"), lit(1))).as("daily_returned_orders"))
      .select(
        col("order_date"), col("daily_orders"), col("daily_unique_customers"),
        col("rev_d").as("daily_revenue"),
        col("cost_d").as("daily_cost"),
        (col("rev_d") - col("cost_d")).as("daily_profit"),
        avgOf(col("rev_d"), col("n")).as("daily_avg_order_value"),
        col("daily_new_customers"), col("daily_returning_customers"),
        col("daily_promo_orders"), col("daily_returned_orders"))

  /** A7 weekly summary (reference `time_analytics.sql:39-55`). */
  def weeklySummary(orders: DataFrame): DataFrame =
    orders.groupBy(date_trunc("week", col("ordered_at")).cast(DateType).as("order_week"))
      .agg(
        countDistinct(col("order_id")).as("weekly_orders"),
        countDistinct(col("customer_id")).as("weekly_unique_customers"),
        dec18(sum(col("order_total"))).as("rev_d"),
        dec18(sum(col("order_cost"))).as("cost_d"),
        count(col("order_id")).as("n"))
      .select(
        col("order_week"), col("weekly_orders"), col("weekly_unique_customers"),
        col("rev_d").cast("double").as("weekly_revenue"),
        col("cost_d").cast("double").as("weekly_cost"),
        (col("rev_d") - col("cost_d")).cast("double").as("weekly_profit"),
        avgOf(col("rev_d"), col("n")).as("weekly_avg_order_value"))

  /** A8 monthly summary — 4-key grouping where year/month/quarter are
    * functions of the truncated month (reference `time_analytics.sql:
    * 57-77` `group by 1, 8, 9, 10`). Decimal revenue kept for growth
    * metrics.
    */
  def monthlySummary(orders: DataFrame): DataFrame =
    orders.groupBy(
        date_trunc("month", col("ordered_at")).cast(DateType).as("order_month"),
        year(col("ordered_at")).as("order_year"),
        month(col("ordered_at")).as("order_month_num"),
        quarter(col("ordered_at")).as("order_quarter"))
      .agg(
        countDistinct(col("order_id")).as("monthly_orders"),
        countDistinct(col("customer_id")).as("monthly_unique_customers"),
        dec18(sum(col("order_total"))).as("rev_d"),
        dec18(sum(col("order_cost"))).as("cost_d"),
        count(col("order_id")).as("n"))
      .select(
        col("order_month"), col("monthly_orders"), col("monthly_unique_customers"),
        col("rev_d").as("monthly_revenue"),
        col("cost_d").as("monthly_cost"),
        (col("rev_d") - col("cost_d")).as("monthly_profit"),
        avgOf(col("rev_d"), col("n")).as("monthly_avg_order_value"),
        col("order_year"), col("order_month_num"), col("order_quarter"))

  /** Multi-level ROLLUP aggregation: one scan produces month, quarter,
    * year, and grand-total rows with a `grouping_id` discriminator —
    * Spark's Expand operator replicates each input row once per
    * grouping set BEFORE the hash aggregate, so the drill-down "cube
    * slice" costs one shuffle instead of four scans + a union of the
    * per-grain summary marts. `grouping_id` bit order (first rollup
    * column = most significant) matches DuckDB's `GROUPING(...)`
    * exactly, so the oracle is a plain `GROUP BY ROLLUP`. Beyond the
    * reference surface (its time_analytics emits fixed per-grain CTEs);
    * counts use order_id (orders grain: count == countDistinct without
    * the extra dedup aggregation). */
  def revenueRollup(orders: DataFrame): DataFrame =
    orders.rollup(
        year(col("ordered_at")).as("order_year"),
        quarter(col("ordered_at")).as("order_quarter"),
        month(col("ordered_at")).as("order_month_num"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(col("order_id")).as("n_orders"),
        countDistinct(col("customer_id")).as("n_customers"),
        dec18(sum(col("order_total"))).as("revenue"))

  /** CUBE over two INDEPENDENT dimensions (year × promo flag): all
    * four grouping sets from one Expand + one shuffle, with the same
    * `grouping_id` bit convention as ROLLUP ([[revenueRollup]]) —
    * completing the grouping-sets family (GROUP BY / ROLLUP / CUBE /
    * pivot). */
  def revenueCube(orders: DataFrame): DataFrame =
    orders.cube(
        year(col("ordered_at")).as("order_year"),
        col("is_promo_order"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(col("order_id")).as("n_orders"),
        dec18(sum(col("order_total"))).as("revenue"))

  /** LOCF gap-filling over the calendar spine — the time-series
    * imputation every reporting layer needs: days with no orders get
    * the last observed revenue carried forward (`last_value ignore
    * nulls` over the spine ⟕ daily join), with the observed flag kept
    * so consumers can tell filled from real. The window is the
    * calendar-bounded one-row-per-day shape (documented
    * unpartitioned-window exception); the fill happens on the EXACT
    * decimal and converts once at the boundary. */
  def dailyGapfill(spark: org.apache.spark.sql.SparkSession,
                   daily: DataFrame): DataFrame = {
    val spine = timeSpine(spark)
    val joined = spine.join(daily,
      spine("date_day") === daily("order_date"), "left")
    val w = BoundedWindow.orderBy(col("date_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.select(
      col("date_day"),
      col("daily_revenue").cast("double").as("daily_revenue"),
      last(col("daily_revenue"), ignoreNulls = true).over(w)
        .cast("double").as("revenue_filled"),
      col("order_date").isNotNull.as("is_observed"))
  }

  /** Trailing-window anomaly flags over daily revenue — the metric
    * monitor every production pipeline runs on its daily rollups: a
    * day is anomalous when its revenue deviates more than
    * [[AnomalySigma]] sample standard deviations from the TRAILING
    * [[AnomalyWindow]]-day baseline (current day excluded — a spike
    * must not mask itself by inflating its own baseline; windows with
    * fewer than [[AnomalyMinDays]] prior days emit no verdict).
    *
    * Determinism: the baseline moments are EXACT decimal window sums
    * (Σx, Σx², n — partition-order independent), finished by the
    * string-routed [[graft.functions.Funcs.stddevFromSums]] recipe;
    * the 2σ comparison is identical IEEE arithmetic on both engines.
    * The window is calendar-bounded (one row per day), the documented
    * unpartitioned-window exception. */
  val AnomalyWindow = 28
  val AnomalyMinDays = 14
  val AnomalySigma = 2.0

  /** EWMA anomaly tunables: half-life-1-day decay over a [[EwmaHorizon]]-
    * day lookback (weights 2^(H−Δ) — POWERS OF TWO so the whole
    * weighted sum stays exact integer cents, the repo's exact-until-
    * the-boundary rule), spike = relative deviation from the prior-day
    * EWMA above [[EwmaRelDev]] with ≥ [[EwmaMinDays]] days of history. */
  val EwmaHorizon = 16
  val EwmaMinDays = 7
  val EwmaRelDev = 0.5

  def revenueAnomalies(daily: DataFrame): DataFrame = {
    val w = BoundedWindow.orderBy(col("order_date"))
      .rowsBetween(-AnomalyWindow, -1)
    val rev = col("daily_revenue")
    val base = daily.select(
      col("order_date"), rev,
      count(rev).over(w).as("n_base"),
      sum(rev).over(w).as("sum_base"),
      sum(rev * rev).over(w).as("sumsq_base"))
    val mean = col("sum_base").cast("string").cast("double") /
      col("n_base").cast("double")
    val std = graft.functions.Funcs.stddevFromSums(
      col("sum_base"), col("sumsq_base"), col("n_base"))
    base.select(
      col("order_date"),
      rev.cast("double").as("daily_revenue"),
      col("n_base"),
      when(col("n_base") >= AnomalyMinDays, mean).as("baseline_mean"),
      when(col("n_base") >= AnomalyMinDays, std).as("baseline_std"),
      when(col("n_base") >= AnomalyMinDays && std.isNotNull,
        abs(rev.cast("string").cast("double") - mean) > lit(AnomalySigma) * std)
        .as("is_anomaly"))
  }

  /** EWMA-baseline revenue anomalies — the exponentially-weighted twin
    * of [[revenueAnomalies]]'s flat trailing window (recent days count
    * more, the standard ops-monitoring smoother). The recursive EWMA
    * is re-expressed as a BOUNDED weighted sum over the last
    * [[EwmaHorizon]] days with weights 2^(H−Δ): exact-integer cents ×
    * power-of-two weights means every aggregate is order-free Long
    * arithmetic and the only IEEE ops are the two fixed-order
    * divisions at the output boundary (wsum/wden, then /100) plus the
    * relative-deviation division — bit-identical cross-engine without
    * any quantization step. The lookback join is calendar-bounded on
    * BOTH sides (≤ 3650 days × ≤ H matches), so the broadcast
    * inequality join is the correct plan — the same bounded-dim
    * argument as the daily window family. */
  def ewmaAnomalies(daily: DataFrame): DataFrame = {
    val cents = (col("daily_revenue") * 100).cast("long")
    val cur = daily.select(col("order_date"), col("daily_revenue"),
      cents.as("cents"))
    val prior = daily.select(col("order_date").as("p_date"), cents.as("p_cents"))
    val dd = datediff(col("order_date"), col("p_date"))
    // shiftleft's Scala binding takes a literal bit count; the SQL
    // form accepts a column expression
    val w = expr(s"shiftleft(1L, $EwmaHorizon - datediff(order_date, p_date))")
    cur.join(broadcast(prior), dd.between(1, EwmaHorizon), "left")
      .groupBy(col("order_date"), col("daily_revenue"), col("cents"))
      .agg(
        count(col("p_cents")).as("n_base"),
        sum(col("p_cents") * w).as("wsum"),
        sum(when(col("p_cents").isNotNull, w)).as("wden"))
      .select(
        col("order_date"),
        col("daily_revenue").cast("double").as("daily_revenue"),
        col("n_base"),
        when(col("n_base") >= EwmaMinDays,
          col("wsum").cast("double") / col("wden").cast("double") / lit(100.0))
          .as("ewma_baseline"),
        when(col("n_base") >= EwmaMinDays && col("wsum") > 0,
          abs(col("cents") * col("wden") - col("wsum")).cast("double")
            / col("wsum").cast("double")).as("rel_dev"),
        when(col("n_base") >= EwmaMinDays && col("wsum") > 0,
          abs(col("cents") * col("wden") - col("wsum")).cast("double")
            / col("wsum").cast("double") > lit(EwmaRelDev)).as("is_spike"))
  }

  /** CUSUM tunables: per-day slack = S div [[CusumSlackDiv]] in
    * n-scaled cents (≈ 5% of the mean per step — deviations smaller
    * than that never accumulate), alarm when a side's statistic
    * exceeds [[CusumAlarmMeanDays]]·S (≈ that many full-mean days of
    * cumulative excess). Both are exact integers derived from the
    * series itself, so the detector is scale-free. */
  val CusumSlackDiv = 20L
  val CusumAlarmMeanDays = 2L

  /** CUSUM changepoint detection (Page 1954) on daily revenue — the
    * sequential-detection classic: the one-sided statistics
    * C⁺_t = max(0, C⁺_{t−1} + (x_t − μ − k)) and its lower twin
    * accumulate persistent drift that a per-day threshold
    * ([[revenueAnomalies]]/[[ewmaAnomalies]]) never sees. The
    * recursion is re-expressed in CLOSED FORM over prefix extrema —
    * C⁺_t = P_t − min(0, min_{j≤t} P_j) with P the running sum of
    * n-SCALED deviations n·x_t − S ∓ (S div [[CusumSlackDiv]]) — so
    * the whole statistic is two window sums and two window extrema
    * over exact int64, no sequential scan. μ is the series' own mean,
    * so a step change alarms on BOTH sides of the cut (the below-mean
    * regime drives C⁻, the above-mean regime C⁺) — the alarm
    * boundary localizes the changepoint.
    *
    * Determinism: n-scaling avoids the mean division entirely; every
    * statistic is exact int64 (headroom: |P_t| ≤ days²·max_cents —
    * ~1e15 at ten years of 1e8-cent days, 2^63 ≈ 9.2e18; CusumSpec
    * asserts the bound on the gated data); the only IEEE ops are the
    * two scale-free output divisions C/S. The window is
    * calendar-bounded (one row per day), the documented
    * unpartitioned-window exception.
    *
    * At 100 TB the daily rollup this reads is already
    * vocabulary-bounded (≤ 3650 rows for a decade); production at
    * larger magnitudes would widen P to decimal(38,0) — the int64
    * bound is asserted, not assumed. */
  def revenueCusum(daily: DataFrame): DataFrame = {
    val cents = (col("daily_revenue") * 100).cast("long")
    val base = daily.select(col("order_date"), col("daily_revenue"),
      cents.as("cents"))
    val tot = base.agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
    val w = BoundedWindow.orderBy(col("order_date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.crossJoin(broadcast(tot))
      .withColumn("adj_pos",
        expr(s"n * cents - s - (s div $CusumSlackDiv)"))
      .withColumn("adj_neg",
        expr(s"n * cents - s + (s div $CusumSlackDiv)"))
      .withColumn("p_pos", sum(col("adj_pos")).over(w))
      .withColumn("p_neg", sum(col("adj_neg")).over(w))
      .withColumn("cusum_pos",
        col("p_pos") - least(min(col("p_pos")).over(w), lit(0L)))
      .withColumn("cusum_neg",
        greatest(max(col("p_neg")).over(w), lit(0L)) - col("p_neg"))
      .select(
        col("order_date"),
        col("daily_revenue").cast("double").as("daily_revenue"),
        col("cusum_pos"), col("cusum_neg"),
        (col("cusum_pos").cast("double") / col("s").cast("double"))
          .as("cusum_pos_days"),
        (col("cusum_neg").cast("double") / col("s").cast("double"))
          .as("cusum_neg_days"),
        (col("cusum_pos") > lit(CusumAlarmMeanDays) * col("s")).as("alarm_pos"),
        (col("cusum_neg") > lit(CusumAlarmMeanDays) * col("s")).as("alarm_neg"))
  }

  /** THEIL–SEN robust trend (Theil 1950; Sen 1968) on daily revenue —
    * the median-of-pairwise-slopes estimator with a 29.3% breakdown
    * point: unlike OLS, a season of outlier days cannot drag the
    * trend. Slope = lower median over all day-pair slopes
    * (c_j − c_i)/(d_j − d_i); intercept = lower median of the
    * per-day residuals c_i − slope·d_i (days since epoch).
    *
    * Determinism: revenues are exact cents and day gaps exact ints,
    * so each pair slope is ONE IEEE division; medians select by the
    * TOTAL order (value, date_i, date_j) at position (N+1)/2 — a
    * deterministic element pick, never an averaged midpoint (which
    * would add an engine-shape-sensitive addition).
    *
    * Scale: inherently pairwise, but the pair domain is the CALENDAR
    * — ≤ 3650 days a decade ⇒ ≤ 6.7M pairs regardless of corpus
    * size. The slope median goes through the TWO-PHASE
    * [[graft.operators.Ranks.globalRank]] (range-partitioned, no
    * single-task sort); ranking is (slope DESC, pair-key asc), so the
    * asc lower-median is the element at desc position N − (N+1)÷2 + 1
    * — under ties the VALUE at any multiset position is
    * tie-order-independent and only the value is emitted, so the desc
    * rank is safe. The pair count is the closed form n(n−1)/2 (no
    * counting pass over the pair relation), and the residual median's
    * window runs over the ≤3650-row daily set. Production at century
    * scale would switch to O(n log n) Matoušek randomized selection;
    * the exact form is the right tool at any realistic retention. */
  def revenueTheilSen(daily: DataFrame): DataFrame = {
    val cents = (col("daily_revenue") * 100).cast("long")
    val base = daily.select(col("order_date"),
      datediff(col("order_date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"),
      cents.as("c"))
    val a = base.select(col("d").as("d_a"), col("c").as("c_a"))
    val b = base.select(col("d").as("d_b"), col("c").as("c_b"))
    // pk = d_a·1e6 + d_b: unique per pair (epoch days < 1e6 for any
    // plausible calendar), the strict-total-order tiebreak globalRank needs
    // spread the LEFT side first: a nested-loop join's parallelism is
    // its streamed side's partition count, and the ≤3650-row daily Mat
    // arrives as ONE split — unspread, the n²/2 pair build runs on a
    // single core (measured: ~5.8 s at 2.9M pairs; spread: sub-second)
    val pairs = a.repartition(a.sparkSession.sparkContext.defaultParallelism)
      .join(broadcast(b), col("d_a") < col("d_b"))
      .select((col("d_a") * lit(1000000L) + col("d_b")).as("pk"),
        ((col("c_b") - col("c_a")).cast("double") /
          (col("d_b") - col("d_a")).cast("double")).as("slope"))
    val nRow = base.agg(count(lit(1)).as("n_days"))
      .withColumn("n_pairs", expr("n_days * (n_days - 1) div 2"))
    // the slope rides THROUGH the rank pipeline (globalRankWithValue)
    // instead of being joined back on pk: that join-back was this
    // query's only unhinted join, and its broadcast-vs-SMJ choice
    // flapped with Catalyst size estimates — the r12 plan-budget churn
    // (8→10→7). Value-carry deletes the join and pins the plan shape.
    val ranked = graft.operators.Ranks.globalRankWithValue(pairs, "pk",
      col("slope"), "slope", "rn_desc")
    val slopeRow = ranked
      .crossJoin(broadcast(nRow))
      .filter(col("rn_desc") === expr("n_pairs - ((n_pairs + 1) div 2) + 1"))
      .select(col("slope"), col("n_days"), col("n_pairs"))
    val resid = base.crossJoin(broadcast(slopeRow))
      .select(col("order_date"), col("n_days"), col("n_pairs"), col("slope"),
        (col("c").cast("double") - col("slope") * col("d").cast("double"))
          .as("r"))
    val wR = BoundedWindow.orderBy(col("r"), col("order_date"))
    resid
      .withColumn("rn", row_number().over(wR))
      .filter(col("rn") === expr("(n_days + 1) div 2"))
      .select(col("n_days"), col("n_pairs"),
        col("slope").as("slope_cents_per_day"),
        col("r").as("intercept_cents"))
  }

  /** STL-STYLE SEASONAL DECOMPOSITION of daily revenue (Cleveland et
    * al. 1990's trend/seasonal/remainder split, with the repo's
    * deterministic estimators in each role): trend = the ROBUST
    * Theil-Sen line (passed in — a Mat'd trained artifact), seasonal =
    * the CENTERED day-of-week means of the detrended series, remainder
    * = what neither explains. Every row also carries the Hyndman &
    * co. STRENGTH gates — F_seasonal = max(0, 1 − Var(R)/Var(S+R)) and
    * F_trend = max(0, 1 − Var(R)/Var(T+R)) — so a consumer reads
    * whether the decomposition EARNED its components before trusting
    * them (the forecast_eval discipline: measured, not assumed).
    *
    * Determinism: cents and epoch-days are exact ints; dow is the
    * engine-independent ((d % 7) + 7) % 7 (never an extract-dow
    * convention mismatch, and sign-safe for pre-1970 dates where
    * Spark's pmod and DuckDB's % disagree); every cross-row double
    * sum — per-dow means, the
    * seasonal centering, all six variance moments — folds in a FIXED
    * (day or dow) order over calendar-bounded collected arrays (the
    * Neyman fold idiom); strengths are fixed trees of those folds.
    *
    * Scale: the daily table is calendar-bounded (≤3650 rows/decade),
    * so the collects are bounded regardless of corpus size; the only
    * corpus-scale work already happened in the Mat'd daily summary
    * and Theil-Sen line. */
  val StlPeriod = 7

  def revenueStl(daily: DataFrame, line: DataFrame): DataFrame = {
    val base = daily.select(col("order_date"),
      datediff(col("order_date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"),
      (col("daily_revenue") * 100).cast("long").as("cents"))
    val det = base
      .crossJoin(broadcast(line.select(col("slope_cents_per_day"),
        col("intercept_cents"))))
      .withColumn("trend",
        col("slope_cents_per_day") * col("d").cast("double")
          + col("intercept_cents"))
      .withColumn("detrended", col("cents").cast("double") - col("trend"))
      // ((d % 7) + 7) % 7 — NOT pmod vs bare %: for pre-1970 dates d
      // is negative and Spark's pmod yields [0,6] while DuckDB's %
      // yields negatives, silently regrouping seasonal means; this
      // double-mod is engine-independent on any sign (ADVICE r16)
      .withColumn("dow_key",
        expr(s"((d % $StlPeriod) + $StlPeriod) % $StlPeriod"))
    val seas0 = det.groupBy("dow_key")
      .agg(count(lit(1)).as("n_dow"),
        array_sort(collect_list(struct(col("d"), col("detrended")))).as("a"))
      .select(col("dow_key"), col("n_dow"),
        (expr("aggregate(a, cast(0.0 as double), (acc, x) -> acc + x.detrended)")
          / col("n_dow").cast("double")).as("seasonal_raw"))
    val adj = seas0
      .agg(array_sort(collect_list(struct(col("dow_key"),
          col("seasonal_raw")))).as("s"),
        count(lit(1)).as("np"))
      .select((expr(
        "aggregate(s, cast(0.0 as double), (acc, x) -> acc + x.seasonal_raw)")
        / col("np").cast("double")).as("adj"))
    val seas = seas0.crossJoin(broadcast(adj))
      .select(col("dow_key"), (col("seasonal_raw") - col("adj")).as("seasonal"))
    val rows = det.join(broadcast(seas), Seq("dow_key"))
      .withColumn("remainder", col("detrended") - col("seasonal"))
      .withColumn("deseason", col("cents").cast("double") - col("seasonal"))
    def fold(f: String) =
      expr(s"aggregate(a, cast(0.0 as double), (acc, x) -> acc + $f)")
    val strength = rows
      .agg(array_sort(collect_list(struct(col("d"), col("remainder"),
          col("detrended"), col("deseason")))).as("a"),
        count(lit(1)).as("n"))
      .select(col("n").cast("double").as("nd"),
        fold("x.remainder").as("s_r"),
        fold("x.remainder * x.remainder").as("s_r2"),
        fold("x.detrended").as("s_dt"),
        fold("x.detrended * x.detrended").as("s_dt2"),
        fold("x.deseason").as("s_ds"),
        fold("x.deseason * x.deseason").as("s_ds2"))
      .select(
        (col("s_r2") / col("nd")
          - (col("s_r") / col("nd")) * (col("s_r") / col("nd"))).as("var_r"),
        (col("s_dt2") / col("nd")
          - (col("s_dt") / col("nd")) * (col("s_dt") / col("nd"))).as("var_dt"),
        (col("s_ds2") / col("nd")
          - (col("s_ds") / col("nd")) * (col("s_ds") / col("nd"))).as("var_ds"))
      .select(
        when(col("var_dt") > 0,
          greatest(lit(0.0), lit(1.0) - col("var_r") / col("var_dt")))
          .as("seasonal_strength"),
        when(col("var_ds") > 0,
          greatest(lit(0.0), lit(1.0) - col("var_r") / col("var_ds")))
          .as("trend_strength"))
    rows.crossJoin(broadcast(strength))
      .select(col("order_date"), col("cents"), col("trend"), col("seasonal"),
        col("remainder"), col("seasonal_strength"), col("trend_strength"))
  }

  /** Explicit GROUPING SETS — the general form ROLLUP and CUBE
    * specialize: exactly the requested grain combinations ((month),
    * (promo flag), ()) from ONE Expand + one shuffle, where cube would
    * also compute the unrequested (month, promo) set. Same
    * `grouping_id` bit convention as [[revenueRollup]]/[[revenueCube]]
    * (bit set = column aggregated away). */
  def revenueGroupingSets(orders: DataFrame): DataFrame = {
    val base = orders.select(
      date_trunc("month", col("ordered_at")).cast(org.apache.spark.sql.types.DateType)
        .as("order_month"),
      col("is_promo_order"), col("order_id"), col("order_total"))
    base.groupingSets(
        Seq(Seq(col("order_month")), Seq(col("is_promo_order")), Seq.empty),
        col("order_month"), col("is_promo_order"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(col("order_id")).as("n_orders"),
        graft.functions.Funcs.dec18(sum(col("order_total"))).as("revenue"))
  }

  /** 7-day moving revenue window over the daily summary — the rows
    * frame (`6 preceding .. current`) moving aggregate, the one frame
    * shape the surface didn't cover. The window is UNPARTITIONED but
    * bounded by the CALENDAR (one row per day, fixed date range), not
    * by SF — the documented exception PlanGuardSpec allowlists;
    * decimal sums keep the running totals exact. */
  def dailyMovingStats(daily: DataFrame): DataFrame = {
    val w = BoundedWindow.orderBy(col("order_date")).rowsBetween(-6, Window.currentRow)
    daily.select(
        col("order_date"),
        sum(col("daily_revenue")).over(w).as("rev_7d"),
        count(lit(1)).over(w).as("n_days_7d"))
      .select(
        col("order_date"),
        col("rev_7d").cast("double").as("revenue_7d"),
        col("n_days_7d"),
        (col("rev_7d").cast("double") / col("n_days_7d").cast("double"))
          .as("avg_daily_revenue_7d"))
  }

  /** Distribution window functions (percent_rank / cume_dist / ntile)
    * over orders WITHIN their month: each order's standing among its
    * month's peers. Partitioned by the bounded month key — these
    * functions need a total order of their partition, so partitioning
    * by a time bucket is the shape that scales (a global version would
    * be a single-partition window; see operators/Ranks for the
    * two-phase global alternative). Unique (total, order_id) ordering
    * keeps every value deterministic. */
  def monthlyOrderStats(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(date_trunc("month", col("ordered_at")).cast(DateType))
      .orderBy(col("order_total"), col("order_id"))
    orders.select(
      col("order_id"),
      date_trunc("month", col("ordered_at")).cast(DateType).as("order_month"),
      col("order_total"),
      percent_rank().over(w).as("pct_rank_in_month"),
      cume_dist().over(w).as("cume_dist_in_month"),
      ntile(4).over(w).as("quartile_in_month"))
  }

  /** Quarterly revenue pivot: one row per year, one column per quarter
    * — Spark's `pivot` with an EXPLICIT value list (never the
    * implicit distinct-scan form, which adds a full pass and a
    * nondeterministic column order) compiles to conditional
    * aggregation, exactly what the oracle spells out. */
  def quarterlyRevenuePivot(orders: DataFrame): DataFrame =
    orders.groupBy(year(col("ordered_at")).as("order_year"))
      .pivot(quarter(col("ordered_at")), Seq(1, 2, 3, 4))
      .agg(dec18(sum(col("order_total"))))
      .select(col("order_year"), col("1").as("q1_revenue"), col("2").as("q2_revenue"),
        col("3").as("q3_revenue"), col("4").as("q4_revenue"))

  /** A9-A10 cohorts (reference `time_analytics.sql:79-107`).
    * Faithful to the reference *as written*: first_order_date is
    * min(ordered_at) WITHIN the (cohort_month, customer) group, so
    * first_order_month == cohort_month and period_number is always 0 —
    * a quirk of the reference we reproduce rather than "fix". F3
    * month-boundary datediff is still exercised (monthsBetweenBoundary).
    */
  def cohortRetention(orders: DataFrame): DataFrame = {
    val cohort = orders.groupBy(
        date_trunc("month", col("ordered_at")).cast(DateType).as("cohort_month"),
        col("customer_id"))
      .agg(min(col("ordered_at")).as("first_order_date"))
      .withColumn("first_order_month", date_trunc("month", col("first_order_date")).cast(DateType))
    cohort.groupBy(
        col("first_order_month"), col("cohort_month"),
        monthsBetweenBoundary(col("first_order_month"), col("cohort_month")).as("period_number"))
      .agg(countDistinct(col("customer_id")).as("customers"))
  }

  /** A11 seasonal trends by extracted keys (reference
    * `time_analytics.sql:109-124`); F4 extract family. Spark dayofweek
    * is 1=Sunday, matching the documented semantics
    * (`time_analytics.yml:31`); the DuckDB oracle adds +1 to its
    * 0=Sunday convention.
    */
  def seasonalTrends(orders: DataFrame): DataFrame =
    orders.groupBy(
        month(col("ordered_at")).as("month_of_year"),
        quarter(col("ordered_at")).as("quarter_of_year"),
        dayofweek(col("ordered_at")).as("day_of_week"))
      .agg(
        countDistinct(col("order_id")).as("seasonal_orders"),
        dec18(sum(col("order_total"))).as("rev_d"),
        count(col("order_id")).as("n"))
      .select(
        col("month_of_year"), col("quarter_of_year"), col("day_of_week"),
        col("seasonal_orders"),
        col("rev_d").cast("double").as("seasonal_revenue"),
        avgOf(col("rev_d"), col("n")).as("seasonal_avg_order_value"))

  /** W5 lag month-over-month growth (reference `time_analytics.sql:
    * 126-147`). Global window over ~80 month rows — order_month is the
    * (unique) group key, so no tiebreak needed.
    */
  def growthMetrics(orders: DataFrame): DataFrame = {
    val m = monthlySummary(orders)
    val w = BoundedWindow.orderBy(col("order_month"))
    val prevRev = lag(col("monthly_revenue"), 1).over(w)
    val prevOrd = lag(col("monthly_orders"), 1).over(w)
    m.select(
        col("order_month"), col("monthly_revenue"), col("monthly_orders"))
      .withColumn("prev_month_revenue", prevRev)
      .withColumn("prev_month_orders", prevOrd)
      .select(
        col("order_month"),
        col("monthly_revenue").cast("double").as("monthly_revenue"),
        col("prev_month_revenue").cast("double").as("prev_month_revenue"),
        col("prev_month_orders"),
        when(col("prev_month_revenue") > 0,
          (col("monthly_revenue") - col("prev_month_revenue")).cast("double")
            / col("prev_month_revenue").cast("double")).as("revenue_growth_rate"),
        when(col("prev_month_orders") > 0,
          (col("monthly_orders") - col("prev_month_orders")).cast("double")
            / col("prev_month_orders").cast("double")).as("order_growth_rate"))
  }

  /** time_analytics final output: J17 calendar left join preserving gap
    * days, P5 date-range filter, F6 zero backfill (reference
    * `time_analytics.sql:149-179`; clamp adapted to the testdata epoch).
    */
  def timeAnalytics(spark: SparkSession, orders: DataFrame): DataFrame = {
    val spine = timeSpine(spark)
      .filter(col("date_day").between(lit("1995-01-01"), runDate))
    val daily = dailySummary(orders)
    spine.join(daily, spine("date_day") === daily("order_date"), "left")
      .select(
        col("date_day"),
        coalesce(col("daily_orders"), lit(0L)).as("daily_orders"),
        coalesce(col("daily_revenue"), lit(0)).cast("double").as("daily_revenue"),
        coalesce(col("daily_profit"), lit(0)).cast("double").as("daily_profit"),
        coalesce(col("daily_unique_customers"), lit(0L)).as("daily_unique_customers"),
        coalesce(col("daily_avg_order_value"), lit(0.0)).as("daily_avg_order_value"),
        date_trunc("week", col("date_day")).cast(DateType).as("week_start"),
        date_trunc("month", col("date_day")).cast(DateType).as("month_start"),
        year(col("date_day")).as("year"),
        month(col("date_day")).as("month"),
        quarter(col("date_day")).as("quarter"),
        dayofweek(col("date_day")).as("day_of_week"))
  }

  /** Holt α = β = 1/4 as integer shifts (div 4) — exact recursion. */
  val HoltDiv = 4L

  /** Relative one-step-ahead forecast error flagged as a spike. */
  val HoltRelDev = 0.5

  /** HOLT DOUBLE-EXPONENTIAL SMOOTHING (Holt 1957) on daily revenue —
    * the level+trend forecaster the plain EWMA can't be: a steady
    * growth series makes a level-only EWMA permanently lag, while
    * Holt's trend term b_t absorbs it, so the one-step-ahead forecast
    * f_t = l_{t−1} + b_{t−1} stays centered and its residual is a
    * real anomaly signal.
    *
    * Recursion (α = β = 1/4 as exact integer divisions):
    *   l_t = (x_t + 3·(l_{t−1} + b_{t−1})) div 4
    *   b_t = ((l_t − l_{t−1}) + 3·b_{t−1}) div 4
    * with l_1 = x_1, b_1 = x_2 − x_1 — everything exact int64 cents.
    *
    * The recursion is inherently sequential (each state needs the
    * previous), so the Kaplan-Meier mechanism applies: the series is
    * calendar-bounded (≤3650 rows a decade), Spark folds the sorted
    * array ONCE with the `aggregate` HOF — the accumulator is the
    * growing array of (l, b) states, an O(T) left fold — and
    * posexplodes the states back onto rows; DuckDB mirrors with a
    * recursive CTE. Cross-engine `div` alignment PROBED, not assumed
    * (a falling trend goes negative, where floor and truncation part
    * ways): Spark's div and DuckDB's // BOTH truncate toward zero, so
    * the recursions mirror with no correction term (HoltSpec pins a
    * negative-trend series against the driver-side reference).
    * Doubles only in the two output ratios. */
  def revenueHolt(daily: DataFrame): DataFrame = {
    val base = daily.select(col("order_date"),
      (col("daily_revenue") * 100).cast("long").as("cents"))
    val arr = base.agg(array_sort(
      collect_list(struct(col("order_date"), col("cents")))).as("a"))
      .select(col("a"), size(col("a")).as("n"))
      // Holt needs two observations to seed the trend (b_1 = x_2 − x_1);
      // a sub-2-day series yields ZERO ROWS on both engines rather than
      // an ANSI ArrayIndexOutOfBounds here vs an empty join in DuckDB.
      .where(col("n") >= 2)
    // states[i] = struct(l, b) for day i+1 (1-indexed); fold starts at
    // day 1's closed-form state and consumes days 2..n.
    // try_element_at + guarded slice length keep the expression TOTAL:
    // the n >= 2 filter above drops degenerate rows, but Spark's
    // InferFiltersFromGenerate + predicate CSE can still EVALUATE this
    // fold on them (size(st) > 0 is inferred below the posexplode and
    // hoisted eagerly), so an ANSI element_at here would throw on the
    // very rows the filter discards.
    val states = arr.select(col("a"), col("n"),
      expr(s"""aggregate(
        slice(a, 2, if(n >= 2, n - 1, 0)),
        array(named_struct(
          'l', try_element_at(a, 1).cents,
          'b', try_element_at(a, 2).cents - try_element_at(a, 1).cents)),
        (acc, x) -> concat(acc, array(named_struct(
          'l', (x.cents + 3 * (element_at(acc, -1).l + element_at(acc, -1).b)) div $HoltDiv,
          'b', (((x.cents + 3 * (element_at(acc, -1).l + element_at(acc, -1).b)) div $HoltDiv
                 - element_at(acc, -1).l) + 3 * element_at(acc, -1).b) div $HoltDiv))))
      """).as("st"))
    states
      .select(posexplode(col("st")).as(Seq("i", "s")), col("a"))
      .select(
        expr("a[i].order_date").as("order_date"),
        expr("a[i].cents").as("cents"),
        col("s").getField("l").as("level"),
        col("s").getField("b").as("trend"))
      // one-step-ahead forecast: the PREVIOUS state's l+b (calendar-
      // bounded series — the documented unpartitioned-window exception)
      .withColumn("forecast",
        lag(col("level") + col("trend"), 1).over(
          BoundedWindow.orderBy(col("order_date"))))
      .withColumn("residual", col("cents") - col("forecast"))
      .withColumn("rel_dev",
        when(col("forecast") > 0,
          abs(col("residual")).cast("double") / col("forecast").cast("double")))
      .withColumn("is_spike",
        when(col("forecast") > 0, col("rel_dev") > HoltRelDev))
  }

  /** Weekly season length for Holt-Winters (motivated by the repo's
    * own revenue_autocorr lag-7 probe — weekly is the cycle a daily
    * business series plants). */
  val HwSeason = 7

  /** Holdout horizon (days) for [[forecastEval]]. */
  val EvalHorizon = 7

  /** HOLT-WINTERS ADDITIVE TRIPLE SMOOTHING (Winters 1960) — the
    * weekly-seasonal third recursion [[revenueHolt]] lacks, with the
    * identical exactness contract (α = β = γ = 1/4 as truncating
    * int64 divisions, both engines' div/`//` truncate toward zero):
    *   l_t = (x_t − s_{t−m} + 3·(l_{t−1} + b_{t−1})) div 4
    *   b_t = ((l_t − l_{t−1}) + 3·b_{t−1})           div 4
    *   s_t = ((x_t − l_t) + 3·s_{t−m})               div 4
    * seeded the textbook way from the first two seasons: l_m =
    * mean(x_1..m) (div), b_m = (mean season 2 − mean season 1) div m,
    * s_i = x_i − l_m — so the query needs n ≥ 2m and emits ZERO rows
    * below that on both engines (the Holt sub-2-day discipline).
    * One-step forecast f_t = l_{t−1} + b_{t−1} + s_{t−m} is computed
    * INSIDE the fold (the previous state is in hand — no lag window).
    *
    * Mechanism: the series is calendar-bounded (the Kaplan-Meier /
    * Holt exception), so ONE array_sort + `aggregate` fold carries
    * struct(l, b, seas[m], hist) — seas is the rolling m-window
    * (head = s_{t−m}, popped and re-appended each step), hist the
    * emitted states — then posexplode maps states back onto days
    * m+1..n. DuckDB mirrors with a recursive CTE over a LIST column.
    * Doubles: none — every output column is exact int64. */
  def holtWintersDaily(series: DataFrame): DataFrame = {
    val m = HwSeason
    val arr = series
      .agg(array_sort(collect_list(struct(col("d"), col("v")))).as("a"))
      .select(col("a"), size(col("a")).as("n"))
      .where(col("n") >= 2 * m)
      .withColumn("sum1",
        expr(s"aggregate(slice(a, 1, $m), 0L, (s, x) -> s + x.v)"))
      .withColumn("sum2",
        expr(s"aggregate(slice(a, ${m + 1}, $m), 0L, (s, x) -> s + x.v)"))
      .withColumn("l0", expr(s"sum1 div $m"))
      .withColumn("b0", expr(s"(sum2 - sum1) div ${m.toLong * m}"))
    val nl = s"(x.v - element_at(acc.seas, 1) + 3 * (acc.l + acc.b)) div $HoltDiv"
    val nb = s"((($nl) - acc.l) + 3 * acc.b) div $HoltDiv"
    val ns = s"((x.v - ($nl)) + 3 * element_at(acc.seas, 1)) div $HoltDiv"
    val nf = s"acc.l + acc.b + element_at(acc.seas, 1)"
    // guarded slice length + try_element_at keep the fold TOTAL: the
    // n >= 2m filter drops degenerate rows, but Spark can still
    // EVALUATE this expression on them (the revenueHolt
    // InferFiltersFromGenerate lesson) — a negative slice length
    // throws regardless of ANSI mode.
    val hist = arr.select(col("a"), expr(
      s"""aggregate(
           slice(a, ${m + 1}, if(n >= ${2 * m}, n - $m, 0)),
           named_struct(
             'l', l0, 'b', b0,
             'seas', transform(slice(a, 1, $m), x -> x.v - l0),
             'hist', cast(array() as array<struct<l:bigint,b:bigint,s:bigint,f:bigint>>)),
           (acc, x) -> named_struct(
             'l', $nl, 'b', $nb,
             'seas', concat(slice(acc.seas, 2, ${m - 1}), array($ns)),
             'hist', concat(acc.hist, array(named_struct(
               'l', $nl, 'b', $nb, 's', $ns, 'f', $nf))))).hist""").as("hist"))
    hist
      .select(posexplode(col("hist")).as(Seq("i", "st")), col("a"))
      .select(
        expr(s"a[i + $m].d").as("d"),
        expr(s"a[i + $m].v").as("v"),
        col("st").getField("l").as("level"),
        col("st").getField("b").as("trend"),
        col("st").getField("s").as("seasonal"),
        col("st").getField("f").as("forecast"),
        (expr(s"a[i + $m].v") - col("st").getField("f")).as("residual"))
  }

  /** [[holtWintersDaily]] on daily EVENT VOLUME — the series where
    * the weekly cycle actually lives: measured on the driver testdata,
    * daily event counts carry a real day-of-week pattern (lag-7
    * diff-ACF ≈ 0.27, Sunday ≈ −14% vs midweek) while daily REVENUE
    * does not (dow deviation ±4% vs daily CV 44%) — which is why the
    * seasonal arm is registered here and [[forecastEval]] prices both
    * choices instead of assuming. */
  def eventVolumeHw(events: DataFrame): DataFrame =
    holtWintersDaily(
      events.groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("v")))
      .withColumnRenamed("d", "event_date")
      .withColumnRenamed("v", "n_events")

  /** HOLDOUT FORECAST EVALUATION — the query that PRICES a forecaster
    * instead of trusting it (the heldout_surprisal split discipline):
    * freeze each model's state after the first n−[[EvalHorizon]] days,
    * forecast the held-out week from that frozen state (Holt:
    * f_{T+h} = l_T + h·b_T; HW adds the cyclic seasonal
    * s_{T+h−m}), and score MAE and wMAPE = Σ|e| / Σ|actual| — wMAPE
    * rather than MAPE because Σ of per-day double ratios would be an
    * engine-ordered float sum; both reported metrics are single
    * divisions of exact int64 folds.
    *
    * Run on BOTH series so the eval can disagree with the prior:
    * measured at sf0.01, HW beats Holt on event volume (wMAPE 0.0279
    * vs 0.0292 — the weekly cycle is real) and LOSES on daily revenue
    * (0.696 vs 0.647 — no cycle, the seasonal term fits noise). That
    * asymmetry is the point: the eval, not the autocorr hint alone,
    * decides which forecaster a series gets. */
  def forecastEval(daily: DataFrame, events: DataFrame): DataFrame = {
    val rev = daily.select(col("order_date").as("d"),
      (col("daily_revenue") * 100).cast("long").as("v"))
    val ev = events.groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("v"))
    evalSeries(rev, "daily_revenue_cents")
      .unionByName(evalSeries(ev, "event_volume"))
  }

  /** One series' [[forecastEval]] rows (holt + hw). */
  private def evalSeries(series: DataFrame, seriesName: String): DataFrame = {
    val m = HwSeason
    val h = EvalHorizon
    val hnl = s"(x.v + 3 * (acc.l + acc.b)) div $HoltDiv"
    val hnb = s"((($hnl) - acc.l) + 3 * acc.b) div $HoltDiv"
    val nl = s"(x.v - element_at(acc.seas, 1) + 3 * (acc.l + acc.b)) div $HoltDiv"
    val nb = s"((($nl) - acc.l) + 3 * acc.b) div $HoltDiv"
    val ns = s"((x.v - ($nl)) + 3 * element_at(acc.seas, 1)) div $HoltDiv"
    val st = series
      .agg(array_sort(collect_list(struct(col("d"), col("v")))).as("a"))
      .select(col("a"), (size(col("a")) - h).as("tn"))
      .where(col("tn") >= 2 * m)
      .withColumn("sum1",
        expr(s"aggregate(slice(a, 1, $m), 0L, (s, x) -> s + x.v)"))
      .withColumn("sum2",
        expr(s"aggregate(slice(a, ${m + 1}, $m), 0L, (s, x) -> s + x.v)"))
      // guarded slice lengths + try_element_at: the tn >= 2m filter
      // does not stop Spark evaluating these folds on dropped rows
      // (the revenueHolt lesson) — keep every expression total.
      .withColumn("hs", expr(
        s"""aggregate(
             slice(a, 2, if(tn >= 2, tn - 1, 0)),
             named_struct('l', try_element_at(a, 1).v,
                          'b', try_element_at(a, 2).v - try_element_at(a, 1).v),
             (acc, x) -> named_struct('l', $hnl, 'b', $hnb))"""))
      .withColumn("ws", expr(
        s"""aggregate(
             slice(a, ${m + 1}, if(tn >= ${2 * m}, tn - $m, 0)),
             named_struct('l', sum1 div $m,
                          'b', (sum2 - sum1) div ${m.toLong * m},
                          'seas', transform(slice(a, 1, $m),
                                            x -> x.v - (sum1 div $m))),
             (acc, x) -> named_struct('l', $nl, 'b', $nb,
               'seas', concat(slice(acc.seas, 2, ${m - 1}), array($ns))))"""))
      // if() evaluates its taken branch only, so element_at(a, tn+k)
      // never sees a degenerate (tn < 2m) row's out-of-range index
      .withColumn("holt_abs", expr(
        s"""if(tn >= ${2 * m}, aggregate(sequence(1, $h), 0L, (s, k) ->
             s + abs(element_at(a, tn + k).v - (hs.l + k * hs.b))),
           cast(null as bigint))"""))
      .withColumn("hw_abs", expr(
        s"""if(tn >= ${2 * m}, aggregate(sequence(1, $h), 0L, (s, k) ->
             s + abs(element_at(a, tn + k).v
               - (ws.l + k * ws.b
                  + element_at(ws.seas, ((k - 1) % $m) + 1)))),
           cast(null as bigint))"""))
      .withColumn("act", expr(
        s"""if(tn >= ${2 * m}, aggregate(sequence(1, $h), 0L, (s, k) ->
             s + element_at(a, tn + k).v), cast(null as bigint))"""))
    def row(model: String, absCol: String): DataFrame =
      st.select(
        lit(seriesName).as("series"), lit(model).as("model"),
        col("tn").cast("long").as("n_train"), lit(h.toLong).as("n_test"),
        (col(absCol).cast("double") / h.toDouble).as("mae"),
        (col(absCol).cast("double") / col("act").cast("double")).as("wmape"))
    row("holt", "holt_abs").unionByName(row("hw", "hw_abs"))
  }

  /** Two-sided 5% normal critical value (shared literal). */
  val Z05 = 1.959963984540054

  /** MANN–KENDALL TREND TEST (Mann 1945; Kendall 1975) on daily
    * revenue — the significance companion to [[revenueTheilSen]]'s
    * slope (the two are always quoted together): S = Σ_{i<j}
    * sign(x_j − x_i) with the TIE-CORRECTED variance
    * Var·18 = n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5), kept as an exact
    * int64 numerator (n ≤ 3650 ⇒ n³ ≈ 5e10 ≪ 2⁶³). The pair domain is
    * the calendar (the Theil-Sen broadcast-pair precedent); doubles
    * appear only in z = (S∓1)/√(var18/18) — division, one sqrt, one
    * literal compare. */
  def mannKendall(daily: DataFrame): DataFrame = {
    val base = daily.select(col("order_date"),
      (col("daily_revenue") * 100).cast("long").as("c"))
    val n = base.agg(count(lit(1)).as("n_days"))
    val s = base.as("a").join(broadcast(base.as("b")),
      col("a.order_date") < col("b.order_date"))
      .agg(sum(signum(col("b.c") - col("a.c")).cast("long")).as("s_stat"))
    val ties = base.groupBy("c").agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L)),
        lit(0L)).as("tie18"))
    n.crossJoin(broadcast(s)).crossJoin(broadcast(ties))
      .withColumn("var18",
        col("n_days") * (col("n_days") - 1L) * (lit(2L) * col("n_days") + 5L)
          - col("tie18"))
      .withColumn("z",
        when(col("s_stat") > 0,
          (col("s_stat") - 1L).cast("double")
            / sqrt(col("var18").cast("double") / 18.0))
          .when(col("s_stat") < 0,
            (col("s_stat") + 1L).cast("double")
              / sqrt(col("var18").cast("double") / 18.0))
          .otherwise(lit(0.0)))
      .select(col("n_days"), col("s_stat"), col("var18"), col("z"),
        (col("z") > Z05).as("trend_up_05"),
        (col("z") < -Z05).as("trend_down_05"))
  }

  /** WALD–WOLFOWITZ RUNS TEST (1940) for randomness of daily revenue
    * around its median: days at the exact lower-median value drop
    * (standard practice), signs reduce to above/below, and the run
    * count feeds the closed-form z. Counts, run count, and both
    * variance operands are exact int64 (2n₁n₂ ≤ 6.7e6 ⇒ the variance
    * numerator ≈ 4.5e13 ≪ 2⁶³); z is division + one sqrt. The sign
    * sequence is calendar-bounded — the documented unpartitioned-lag
    * exception. */
  def revenueRunsTest(daily: DataFrame): DataFrame = {
    val base = daily.select(col("order_date"),
      (col("daily_revenue") * 100).cast("long").as("c"))
    val nRow = base.agg(count(lit(1)).as("n_all"))
    val med = base.crossJoin(broadcast(nRow))
      .withColumn("rn", row_number().over(
        BoundedWindow.orderBy(col("c"), col("order_date"))))
      .filter(col("rn") === expr("(n_all + 1) div 2"))
      .select(col("c").as("med"))
    val signs = base.crossJoin(broadcast(med))
      .where(col("c") =!= col("med"))
      .select(col("order_date"), (col("c") > col("med")).as("up"))
    val runs = signs
      .withColumn("prev", lag(col("up"), 1).over(BoundedWindow.orderBy(col("order_date"))))
      .agg(
        count(when(col("up"), 1)).as("n_above"),
        count(when(!col("up"), 1)).as("n_below"),
        (count(when(col("prev").isNull || col("prev") =!= col("up"), 1)))
          .as("runs"))
    runs
      .withColumn("n", col("n_above") + col("n_below"))
      .withColumn("two_ab", lit(2L) * col("n_above") * col("n_below"))
      .select(col("n"), col("n_above"), col("n_below"), col("runs"),
        ((col("runs").cast("double")
          - (lit(1.0) + col("two_ab").cast("double") / col("n").cast("double")))
          / sqrt((col("two_ab") * (col("two_ab") - col("n"))).cast("double")
            / (col("n") * col("n") * (col("n") - 1L)).cast("double"))).as("z"))
      .withColumn("random_05", abs(col("z")) <= Z05)
  }

  /** Autocorrelation lags reported (days). */
  val AutocorrLags: Seq[Int] = Seq(1, 7, 28)

  /** LAG AUTOCORRELATION of daily revenue at the [[AutocorrLags]]
    * horizons — the ACF points a seasonality diagnosis starts from
    * (lag-7 high + lag-1 low = weekly cycle). Each lag's five
    * sufficient statistics are EXACT DECIMAL(38,0) sums over the
    * calendar-equi-join of (t, t+k): cents² at 1e8-cent days overflows
    * int64 over a decade (1e16·3650 ≈ 4e19 > 2⁶³), so operands widen
    * to decimal(19,0) BEFORE multiplying — on DuckDB that forces the
    * int128 path (its width-≤18 multiply overflows int64, the
    * documented gotcha), on Spark (19,0)×(19,0) stays exact at scale
    * 0. r_k = (mΣxy − ΣxΣy)/√((mΣxx − Σx²)(mΣyy − Σy²)): exact
    * decimal numerator/denominators, then ONE double division over
    * one sqrt of one product. */
  def revenueAutocorr(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d190 = DecimalType(19, 0)
    val base = daily.select(col("order_date"),
      (col("daily_revenue") * 100).cast("long").cast(d190).as("c"))
    AutocorrLags.map { k =>
      val joined = base.as("a").join(base.as("b"),
        col("b.order_date") === date_add(col("a.order_date"), k))
      joined.agg(
        count(lit(1)).as("n_pairs"),
        sum(col("a.c")).as("sx"), sum(col("b.c")).as("sy"),
        sum(col("a.c") * col("a.c")).as("sxx"),
        sum(col("b.c") * col("b.c")).as("syy"),
        sum(col("a.c") * col("b.c")).as("sxy"))
        .select(lit(k).as("lag"), col("n_pairs"),
          ((col("n_pairs").cast(d190) * col("sxy") - col("sx") * col("sy"))
            .cast("double")
            / sqrt(
              (col("n_pairs").cast(d190) * col("sxx") - col("sx") * col("sx"))
                .cast("double")
                * (col("n_pairs").cast(d190) * col("syy") - col("sy") * col("sy"))
                  .cast("double"))).as("autocorr"))
    }.reduce(_ unionByName _)
  }
}
