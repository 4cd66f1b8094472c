package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import graft.staging.Staging
import graft.marts.{AnalyticsMarts, CoreMarts, SegmentationMart, TimeMarts}

/** Model DAG wiring: each reference model as a (spark, sfDir) => DataFrame.
  * dbt's ref()/source() DAG (SURVEY.md §3.1) is plain function composition.
  * Staging models stay lazy (dbt `view`): Catalyst inlines them and pushes
  * filters/pruning across the boundary. The shared core marts are dbt
  * `table`s: [[Mat.table]] write-then-read parquet barriers, so the
  * orders/order_items subtree is computed once per session, not once per
  * downstream consumer (reference `dbt_project.yml:33-36`).
  */
object Models {

  /** BFS depth of the co-purchase distance query; shared with the
    * oracle's unrolled-CTE mirror (OpsSql) so both engines relax the
    * same number of rounds. */
  val BfsMaxHops = 4

  /** Co-occurrence weight threshold of the strong-edge affinity graph
    * the triangle query runs on; shared with the oracle. */
  val CoPurchaseMinWeight = 2

  /** Hub-degree cap of the RAW-graph capped triangle query (nodes
    * above it are excluded wholesale, flagged, never silently
    * undercounted); shared with the oracle. */
  val TriangleHubCap = 128L

  /** Edge budget of the RAW-graph DOULION triangle estimator: the
    * derived keep_den = ceil(|E|/budget) holds the sampled subgraph at
    * ~budget edges, so wedge work is bounded by budget^1.5 at ANY
    * corpus scale; shared with the oracle. */
  val TriangleEdgeBudget = 60000L

  /** Fixed keep probability (2/3) of the triangle error gate — a
    * deliberately non-trivial num/den so the gate exercises the real
    * unbiasing arithmetic on the graph where exact counting also
    * runs; shared with the oracle. */
  val TriangleSampleNum = 2L
  val TriangleSampleDen = 3L

  /** Fixed-point PageRank rounds; shared with the oracle's unrolled
    * mirror. */
  val PageRankRounds = 4

  /** Top-K cut of the link-prediction report; shared with the oracle. */
  val LinkPredTopK = 100

  /** Synchronous label-propagation rounds; shared with the oracle's
    * unrolled mirror. */
  val LpaRounds = 4

  /** k-core threshold and bounded peel rounds; shared with the
    * oracle's unrolled mirror (the query reports convergence). */
  val KCoreK = 2
  val KCoreRounds = 12

  /** Widest-path (bottleneck) relaxation rounds; shared with the
    * oracle's unrolled mirror (the query reports convergence). */
  val BottleneckRounds = 6

  /** Orders-mart columns the profile query audits; shared with the
    * oracle's generated per-column arms. */
  val OrdersProfileCols: Seq[String] = Seq(
    "order_id", "customer_id", "ordered_at", "location_id",
    "order_total", "subtotal", "tax_paid", "order_status",
    "order_priority", "count_order_items", "order_items_subtotal",
    "order_cost", "count_promo_items", "count_returned_items",
    "is_promo_order", "has_returned_item", "customer_order_number")

  /** The documents-table columns the corpus-grain profiler sketches;
    * shared with the oracle's generated UNION ALL melt. */
  val DocumentsProfileCols: Seq[String] = Seq(
    "doc_id", "text", "lang", "source", "n_chars")

  /** The daily mart's metric columns in melt order; shared with the
    * oracle's UNION ALL mirror. */
  val DailyMeltMetrics: Seq[String] = Seq(
    "daily_orders", "daily_unique_customers", "daily_revenue",
    "daily_cost", "daily_profit", "daily_avg_order_value",
    "daily_new_customers", "daily_returning_customers",
    "daily_promo_orders", "daily_returned_orders")

  def stgCustomers(s: SparkSession, d: String): DataFrame =
    Staging.stgCustomers(Tables.customer(s, d))
  def stgOrders(s: SparkSession, d: String): DataFrame =
    Staging.stgOrders(Tables.orders(s, d))
  def stgOrderItems(s: SparkSession, d: String): DataFrame =
    Staging.stgOrderItems(Tables.lineitem(s, d))
  def stgProducts(s: SparkSession, d: String): DataFrame =
    Staging.stgProducts(Tables.part(s, d))
  def stgLocations(s: SparkSession, d: String): DataFrame =
    Staging.stgLocations(Tables.nation(s, d), Tables.region(s, d))
  def stgSupplies(s: SparkSession, d: String): DataFrame =
    Staging.stgSupplies(Tables.supplier(s, d))

  // ---- core marts (materialized: each feeds 2+ downstream marts) ----

  def orderItems(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "order_items", timeKey = Some("ordered_at"))(
      CoreMarts.orderItems(stgOrderItems(s, d), stgOrders(s, d),
        stgProducts(s, d), stgSupplies(s, d)))
  def orders(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "orders", timeKey = Some("ordered_at"))(
      CoreMarts.orders(stgOrders(s, d), orderItems(s, d)))
  def customers(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "customers")(
      CoreMarts.customers(stgCustomers(s, d), orders(s, d)))

  /** CHANGE DATA FEED between two retained versions of a bucketed
    * customers snapshot mart ([[operators.Cdc]]). v1 is "yesterday's
    * load": orders before the cutoff, minus a late-registration slice
    * of the dim (→ inserts); v2 is today's full rebuild minus an
    * erasure slice (→ deletes); customers whose lifetime aggregates
    * moved across the cutoff emit pre+post images. Both snapshots are
    * versions of ONE mart hash-bucketed on customer_id, so the diff's
    * full-outer join is shuffle-free (CdcSpec asserts the plan). */
  /** "Yesterday's load" customer state: orders before the cutoff,
    * minus a late-registration slice of the dim. Shared by the CDC
    * and SCD2 snapshot queries. */
  private def custStateV1(s: SparkSession, d: String): DataFrame =
    CoreMarts.customers(
      stgCustomers(s, d).filter(col("customer_id") % 17 =!= 3),
      orders(s, d).filter(col("ordered_at") < lit("2000-01-01").cast("timestamp")))

  /** "Today's full rebuild" customer state, minus an erasure slice. */
  private def custStateV2(s: SparkSession, d: String): DataFrame =
    CoreMarts.customers(
      stgCustomers(s, d).filter(col("customer_id") % 101 =!= 7),
      orders(s, d))

  /** Build (once per session) and serve the two retained versions of
    * the bucketed customers snapshot mart — the shared barrier behind
    * the CDC, IVM, and SCD2 queries (each otherwise re-runs two full
    * customer pipelines live). */
  private def custSnapVersions(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val name = "customers_snap"
    val bkt = Some(("customer_id", 8))
    Mat.table(s, d, name, bucketBy = bkt)(custStateV1(s, d))
    // second build = the refreshed snapshot; guarded so repeat calls
    // (bench min-of-3) keep diffing exactly v1 vs v2
    if (Mat.currentVersion(s, d, name) < 2)
      Mat.refresh(s, d, name, bucketBy = bkt)(custStateV2(s, d))
    val cur = Mat.currentVersion(s, d, name)
    (Mat.tableVersion(s, d, name, cur - 1), Mat.tableVersion(s, d, name, cur))
  }

  def martChanges(s: SparkSession, d: String): DataFrame = {
    val (v1, v2) = custSnapVersions(s, d)
    operators.Cdc.changes(v1, v2, Seq("customer_id"))
  }

  /** Incremental view maintenance over the change feed: the
    * per-customer-type (count, lifetime-spend) aggregate of snapshot
    * v2, computed as v1's MATERIALIZED aggregate ⊕ the Δ-sized feed —
    * never re-aggregating the after-snapshot ([[operators.Cdc.maintainAgg]]).
    * The oracle recomputes from v2 directly, so the hash gate IS the
    * maintained==recomputed invariant. */
  def cdcIncrementalAgg(s: SparkSession, d: String): DataFrame = {
    val cdc = martChanges(s, d) // also guarantees v1/v2 exist
    val baseAgg = Mat.table(s, d, "customers_snap_agg")(
      Mat.tableVersion(s, d, "customers_snap", 1)
        .groupBy("customer_type")
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"),
          org.apache.spark.sql.functions.sum(col("lifetime_spend")).as("total")))
    operators.Cdc.maintainAgg(baseAgg, cdc, "customer_type", "lifetime_spend")
      .withColumnRenamed("n", "n_customers")
      .withColumnRenamed("total", "total_lifetime_spend")
  }

  /** Exact-arithmetic Pearson correlation matrix over the order money
    * columns ([[operators.Stats.corrMatrix]] — Spark's own `corr` is
    * partition-order dependent and can't pass a differential gate). */
  def orderCorrelations(s: SparkSession, d: String): DataFrame =
    operators.Stats.corrMatrix(stgOrders(s, d),
      Seq("order_total", "subtotal", "tax_paid"))

  /** Per-transition funnel latency percentiles (view→click→purchase). */
  def funnelLatency(s: SparkSession, d: String): DataFrame =
    operators.Funnel.funnelLatency(Tables.events(s, d))
  /** One-row join-key skew profile of events.user_id — the pre-flight
    * the salted skew join / AQE threshold choice reads. */
  def eventKeySkew(s: SparkSession, d: String): DataFrame =
    operators.Stats.keySkewProfile(Tables.events(s, d), "user_id")
  /** PSI drift monitor: earliest vs latest month of events.value per
    * event_type, reference-pinned bins, decimal-exact term sums. */
  /** The PSI reference quantizer Mat'd (r18, the kmeans/pq trained-
    * artifact convention): read by the batch drift query AND pinned by
    * the streaming monitor — previously the stream re-trained it once
    * per bench pass. */
  private def psiPinnedStats(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "psi_pinned_stats")(
      operators.Stats.psiPinnedStats(Tables.events(s, d)))
  def featureDriftPsi(s: SparkSession, d: String): DataFrame = {
    val pinned = psiPinnedStats(s, d)
    operators.Stats.psiFromCounts(
      operators.Stats.psiBinCounts(Tables.events(s, d), pinned), pinned)
  }

  /** STREAMING sketch maintenance: per-day HLL registers built per
    * micro-batch, merged register-wise at read (associative — no
    * state chaining), estimated per day. */
  def streamHllUsers(s: SparkSession, d: String): DataFrame =
    streaming.Streams.hllSketchStreamOnce(s, d)
  /** STREAMING Count-Min: per-batch token counters summed at read —
    * merged == directly-built exactly, same oracle as the batch CMS. */
  def streamCmsHeavy(s: SparkSession, d: String): DataFrame =
    streaming.Streams.cmsSketchStreamOnce(s, d)
  /** STREAMING histogram quantiles: per-batch bin counters against a
    * pinned quantizer, summed at read — merged == directly-built
    * exactly, same oracle as the batch hist_quantiles. */
  def streamQuantileHist(s: SparkSession, d: String): DataFrame =
    streaming.Streams.histSketchStreamOnce(s, d, histPinnedStats(s, d))
  /** STREAMING PSI drift monitor: per-batch (type, bin, side) counters
    * against the pinned reference quantizer, summed at read — merged
    * == directly-built exactly, same oracle as feature_drift_psi. */
  def streamPsiMonitor(s: SparkSession, d: String): DataFrame =
    streaming.Streams.psiMonitorStreamOnce(s, d, psiPinnedStats(s, d))
  /** Streaming Benford monitor (per-batch mergeable digit counts). */
  def streamBenfordMonitor(s: SparkSession, d: String): DataFrame =
    streaming.Streams.benfordMonitorStreamOnce(s, d)

  /** SCD TYPE-2 SNAPSHOT over the two customer states
    * ([[operators.Snapshot]] — dbt's `snapshot` materialization, check
    * strategy, invalidate_hard_deletes): run 1 initializes every v1
    * row open at the pinned clock; run 2 diffs v2 against the open
    * rows a day later — unchanged rows carry through, changed/deleted
    * rows close at t2, new versions/keys open at t2. The oracle
    * reconstructs the same open/closed/carried row set with
    * per-column IS DISTINCT FROM. Timestamps are built as explicit
    * UTC instants so the literal renders identically under any JVM
    * default zone (sessions pin UTC). */
  def customersScd2(s: SparkSession, d: String): DataFrame = {
    def utcTs(str: String) = java.sql.Timestamp.from(
      java.time.LocalDateTime.parse(str).toInstant(java.time.ZoneOffset.UTC))
    val t1 = utcTs("2001-08-15T00:00:00")
    val t2 = utcTs("2001-08-16T00:00:00")
    // both states come from the shared snapshot-mart barrier — the
    // snapshot diff reads bucketed parquet, not two live pipelines
    val (v1, v2) = custSnapVersions(s, d)
    val checkCols = v1.columns.filterNot(_ == "customer_id").toSeq
    operators.Snapshot.run(operators.Snapshot.init(v1, t1),
      v2, "customer_id", checkCols, t2)
  }

  /** STREAMING incremental view maintenance ([[streaming.Streams.ivmAggStream]]):
    * the per-event-type aggregate served as a batch-built base (events
    * before [[streaming.Streams.IvmCutoff]], a Mat barrier) maintained
    * forward by the streamed post-cutoff feed via the CDC delta rule —
    * each micro-batch costs O(|groups| + |batch|), never a re-read of
    * the base. The oracle re-aggregates the whole table, so the hash
    * gate enforces the maintained == recomputed IVM invariant. */
  private def eventsIvmBase(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{count, sum}
    import org.apache.spark.sql.types.DecimalType
    Mat.table(s, d, "events_ivm_base")(
      Tables.events(s, d)
        .filter(col("ts") <
          lit(streaming.Streams.IvmCutoff).cast("timestamp"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).as("total")))
  }
  def streamIvmAgg(s: SparkSession, d: String): DataFrame =
    streaming.Streams.ivmAggStreamOnce(s, d, eventsIvmBase(s, d))

  // ---- analytics marts (dbt `table`s: materialized — each is read by
  // its own registered query AND its semantic-layer saved query) ----

  /** Pre-rank products core — its own Mat barrier so the four
    * Ranks.globalRank passes in the final stage are pruned 2-column
    * parquet scans instead of re-executions of the fact aggregation. */
  private def productsCore(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "products_core")(
      AnalyticsMarts.productsCore(stgProducts(s, d), orderItems(s, d), orders(s, d)))
  def products(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "products")(AnalyticsMarts.productsFinal(productsCore(s, d)))
  def locations(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "locations")(
      AnalyticsMarts.locations(stgLocations(s, d), orders(s, d), customers(s, d)))
  /** Shared per-supply-row performance table — feeds the supplies mart
    * (ranks + turnover + variance read it 7×) and the supplier rollup. */
  private def supplyPerf(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "supply_performance")(
      AnalyticsMarts.supplyPerformance(stgSupplies(s, d), orderItems(s, d)))
  def supplies(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "supplies")(AnalyticsMarts.supplies(supplyPerf(s, d)))
  def supplierRollup(s: SparkSession, d: String): DataFrame =
    AnalyticsMarts.supplierRollup(supplyPerf(s, d))

  /** Grouped top-k through the native bounded-heap aggregate (the
    * relational use of the ANN top_k expression). */
  def topProductsPerSupplier(s: SparkSession, d: String): DataFrame =
    AnalyticsMarts.topProductsPerSupplier(orderItems(s, d))

  /** Exact population deciles of customer lifetime spend — SQL
    * NTILE/percent_rank/cume_dist over an SF-scaling dim through the
    * two-phase global rank (operators/Quantiles; no single-partition
    * window). */
  def customerValueDeciles(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    operators.Quantiles.exactBuckets(customers(s, d), "customer_id",
      col("lifetime_spend"), 10)
  }

  def timeSpine(s: SparkSession, d: String): DataFrame =
    TimeMarts.timeSpine(s)
  /** Mat'd since r12: the daily series feeds SIX consumers (its own
    * query, the 2σ/EWMA/CUSUM monitors, Theil–Sen, growth) and
    * Theil–Sen's pair build references it multiple times per plan —
    * as a live rollup each reference re-aggregated the orders mart
    * (~0.7 s each, measured; theilsen alone paid it ~6×). */
  def dailySummary(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "daily_summary")(
      TimeMarts.dailySummary(orders(s, d)))
  def weeklySummary(s: SparkSession, d: String): DataFrame =
    TimeMarts.weeklySummary(orders(s, d))
  def monthlySummary(s: SparkSession, d: String): DataFrame =
    TimeMarts.monthlySummary(orders(s, d))
  def cohortRetention(s: SparkSession, d: String): DataFrame =
    TimeMarts.cohortRetention(orders(s, d))
  def seasonalTrends(s: SparkSession, d: String): DataFrame =
    TimeMarts.seasonalTrends(orders(s, d))
  def growthMetrics(s: SparkSession, d: String): DataFrame =
    TimeMarts.growthMetrics(orders(s, d))
  def revenueRollup(s: SparkSession, d: String): DataFrame =
    TimeMarts.revenueRollup(orders(s, d))
  def monthlyOrderStats(s: SparkSession, d: String): DataFrame =
    TimeMarts.monthlyOrderStats(orders(s, d))
  def quarterlyRevenuePivot(s: SparkSession, d: String): DataFrame =
    TimeMarts.quarterlyRevenuePivot(orders(s, d))
  def revenueCube(s: SparkSession, d: String): DataFrame =
    TimeMarts.revenueCube(orders(s, d))
  def revenueGroupingSets(s: SparkSession, d: String): DataFrame =
    TimeMarts.revenueGroupingSets(orders(s, d))
  def dailyMovingStats(s: SparkSession, d: String): DataFrame =
    TimeMarts.dailyMovingStats(dailySummary(s, d))
  /** Wide daily mart melted long — one (day, metric, value) row per
    * cell, every value cast to double at the reshape boundary. */
  def dailyMetricsLong(s: SparkSession, d: String): DataFrame =
    operators.Unpivot.melt(dailySummary(s, d), Seq("order_date"),
      Models.DailyMeltMetrics)
  def revenueAnomalies(s: SparkSession, d: String): DataFrame =
    TimeMarts.revenueAnomalies(dailySummary(s, d))
  /** EWMA-baseline spikes — the exponentially-weighted anomaly twin. */
  def ewmaAnomalies(s: SparkSession, d: String): DataFrame =
    TimeMarts.ewmaAnomalies(dailySummary(s, d))
  /** CUSUM changepoint statistics over the daily revenue series. */
  def revenueCusum(s: SparkSession, d: String): DataFrame =
    TimeMarts.revenueCusum(dailySummary(s, d))
  /** Theil–Sen robust trend over the daily revenue series — Mat'd
    * (r16): the fitted line is a trained artifact like the PCA basis
    * (the embedding_pca precedent), so the n²/2 pair median runs once
    * per session and BOTH consumers (this query and [[revenueStl]])
    * read the 1-row barrier. Parquet double roundtrip is bit-exact,
    * so the oracle contract is unchanged. */
  def revenueTheilSen(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "theilsen_line")(
      TimeMarts.revenueTheilSen(dailySummary(s, d)))
  /** STL-style decomposition of daily revenue: Theil-Sen trend +
    * centered day-of-week seasonal + remainder, with the Hyndman
    * seasonal/trend strength gates. */
  def revenueStl(s: SparkSession, d: String): DataFrame =
    TimeMarts.revenueStl(dailySummary(s, d), revenueTheilSen(s, d))
  /** HRW shard routing report over document ids. */
  def shardRouting(s: SparkSession, d: String): DataFrame =
    operators.Sharding.shardRouting(Tables.documents(s, d))
  /** HRW minimal-motion audit (drop one shard, measure movement). */
  def shardStability(s: SparkSession, d: String): DataFrame =
    operators.Sharding.shardStability(Tables.documents(s, d))
  /** Flesch readability over the shared whitespace tokenization. */
  def docReadability(s: SparkSession, d: String): DataFrame =
    llm.TextStats.readability(Tables.documents(s, d))
  /** Mann-Kendall trend significance over daily revenue. */
  def mannKendall(s: SparkSession, d: String): DataFrame =
    TimeMarts.mannKendall(dailySummary(s, d))
  /** Wald-Wolfowitz runs test for randomness around the median. */
  def revenueRunsTest(s: SparkSession, d: String): DataFrame =
    TimeMarts.revenueRunsTest(dailySummary(s, d))
  /** ACF points at lags 1/7/28 (exact decimal sufficient stats). */
  def revenueAutocorr(s: SparkSession, d: String): DataFrame =
    TimeMarts.revenueAutocorr(dailySummary(s, d))
  /** Holt double-exponential level+trend forecaster (exact ints). */
  def revenueHolt(s: SparkSession, d: String): DataFrame =
    TimeMarts.revenueHolt(dailySummary(s, d))
  /** Holt-Winters weekly-seasonal states on daily event volume. */
  def eventVolumeHw(s: SparkSession, d: String): DataFrame =
    TimeMarts.eventVolumeHw(Tables.events(s, d))
  /** Holdout MAE/wMAPE shoot-out: Holt vs Holt-Winters, both series. */
  def forecastEval(s: SparkSession, d: String): DataFrame =
    TimeMarts.forecastEval(dailySummary(s, d), Tables.events(s, d))
  /** Customer spend-quintile migration matrix across the split. */
  def customerMigration(s: SparkSession, d: String): DataFrame =
    marts.StatsMarts.customerMigration(stgOrders(s, d))
  /** Inter-purchase gap histogram (per-customer keyed lag). */
  def orderGapStats(s: SparkSession, d: String): DataFrame =
    marts.StatsMarts.orderGapStats(stgOrders(s, d))
  /** Pearson chi-square independence: segment x priority. */
  def segmentPriorityChi2(s: SparkSession, d: String): DataFrame =
    marts.StatsMarts.segmentPriorityChi2(stgOrders(s, d), stgCustomers(s, d))
  /** One-row independence verdict (ordered-fold chi2 vs df=16). */
  def segmentPriorityVerdict(s: SparkSession, d: String): DataFrame =
    marts.StatsMarts.segmentPriorityVerdict(stgOrders(s, d), stgCustomers(s, d))
  /** Grouped closed-form OLS: per-product monthly revenue trend. */
  def productTrendOls(s: SparkSession, d: String): DataFrame =
    marts.StatsMarts.productTrendOls(stgOrderItems(s, d), stgOrders(s, d))
  /** Gini coefficient of customer lifetime revenue (rank formula). */
  def revenueGini(s: SparkSession, d: String): DataFrame =
    marts.StatsMarts.revenueGini(stgOrders(s, d))
  /** Lorenz curve at decile grain over the same ranked revenue. */
  def lorenzDeciles(s: SparkSession, d: String): DataFrame =
    marts.StatsMarts.lorenzDeciles(stgOrders(s, d))
  /** Benford first-digit distribution audit over order totals. */
  def benfordDigits(s: SparkSession, d: String): DataFrame =
    marts.StatsMarts.benfordDigits(stgOrders(s, d))
  /** Benford audit over the event value stream. */
  def eventBenford(s: SparkSession, d: String): DataFrame =
    marts.StatsMarts.eventBenford(Tables.events(s, d))
  /** One-row Benford χ²/MAD verdict (ordered-fold totals). */
  def benfordSummary(s: SparkSession, d: String): DataFrame =
    marts.StatsMarts.benfordSummary(stgOrders(s, d))
  /** Exact two-sample KS drift: weekday vs weekend order totals. */
  def ksWeekendDrift(s: SparkSession, d: String): DataFrame =
    marts.StatsMarts.ksWeekendDrift(stgOrders(s, d))
  /** Kaplan–Meier customer-tenure survival (exact-integer fold). */
  def customerSurvivalKm(s: SparkSession, d: String): DataFrame =
    marts.StatsMarts.customerSurvivalKm(stgOrders(s, d))
  /** Market-basket association rules (support/confidence/lift). */
  def basketRules(s: SparkSession, d: String): DataFrame =
    marts.StatsMarts.basketRules(stgOrderItems(s, d))
  /** Jaro–Winkler near-duplicate product-name pairs (blocked). */
  def jwNamePairs(s: SparkSession, d: String): DataFrame =
    marts.StatsMarts.jwNamePairs(stgProducts(s, d))
  /** Length-band blocking recall vs the exact all-pairs JW truth. */
  def jwRecall(s: SparkSession, d: String): DataFrame =
    marts.StatsMarts.jwRecall(stgProducts(s, d))
  /** Grouped lead/lag cross-correlation matrix over event-type daily
    * volumes (±7-day lags, per-pair Pearson with the peak flagged). */
  def eventTypeXcorr(s: SparkSession, d: String): DataFrame =
    marts.StatsMarts.eventTypeXcorr(Tables.events(s, d))
  def dailyGapfill(s: SparkSession, d: String): DataFrame =
    TimeMarts.dailyGapfill(s, dailySummary(s, d))
  def timeAnalytics(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "time_analytics", timeKey = Some("date_day"))(
      TimeMarts.timeAnalytics(s, orders(s, d)))

  def customerSegmentation(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "customer_segmentation")(
      SegmentationMart.customerSegmentation(customers(s, d), orders(s, d), orderItems(s, d)))
  /** k-anonymity release audit over the segmentation quasi-ids. */
  /** Right-to-be-forgotten scrub audit over events + derived marts. */
  def forgetAudit(s: SparkSession, d: String): DataFrame =
    operators.Forget.forgetAudit(Tables.events(s, d))
  def kAnonymityAudit(s: SparkSession, d: String): DataFrame =
    llm.Redaction.kAnonymityAudit(customerSegmentation(s, d))
  /** l-diversity audit (homogeneity-attack companion) over the same
    * quasi-identifier set. */
  def lDiversityAudit(s: SparkSession, d: String): DataFrame =
    llm.Redaction.lDiversityAudit(customerSegmentation(s, d))
  /** t-closeness audit (skew-attack companion) — same quasi-ids and
    * sensitive attribute; completes the release-audit trio. */
  def tClosenessAudit(s: SparkSession, d: String): DataFrame =
    llm.Redaction.tClosenessAudit(customerSegmentation(s, d))

  // ---- LLM-pipeline operators (documents / embeddings tables) ----

  /** Shared shingle table (doc_id, sh) — materialized once, feeds both
    * the MinHash and Jaccard paths. */
  private def docShingles(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "doc_shingles")(llm.Dedup.docShingles(Tables.documents(s, d)))

  def dedupExact(s: SparkSession, d: String): DataFrame =
    llm.Dedup.exactDedup(Tables.documents(s, d))
  /** Normalization-before-hash exact dedup (CCNet canonical form). */
  def dedupNormalized(s: SparkSession, d: String): DataFrame =
    llm.Dedup.normalizedDedup(Tables.documents(s, d))
  def minhashSignatures(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "minhash_sigs")(llm.Dedup.minhashSignatures(docShingles(s, d)))
  /** Mat-materialized (VERDICT r3 "What's wrong" #2): read by its own
    * registered query, the cluster operator, and (transitively) the
    * curation pipeline — without the barrier each consumer re-runs the
    * banded self-join, two extra corpus passes per curation run. */
  def minhashPairs(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "minhash_pairs")(llm.Dedup.minhashPairs(minhashSignatures(s, d)))
  /** Character-level (Levenshtein ≤ T) near-dup verification over the
    * Mat'd MinHash band candidates — the typo/small-patch dedup family. */
  def editDistancePairs(s: SparkSession, d: String): DataFrame =
    llm.Dedup.editDistancePairs(Tables.documents(s, d), minhashPairs(s, d))
  /** Materialized like the minhash signatures: the pairs query reads
    * the table three times (band explode + both self-join sides). */
  def simhashSignatures(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "simhash_sigs")(llm.Dedup.simhashSignatures(Tables.documents(s, d)))
  def simhashPairs(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "simhash_pairs")(llm.Dedup.simhashPairs(simhashSignatures(s, d)))
  /** Distinct hashed shingle keys — read 4× by the Jaccard pair query. */
  private def docShingleKeys(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "doc_shingle_keys")(llm.Dedup.docShingleKeys(docShingles(s, d)))
  /** Mat'd like minhash_pairs: the rare-shingle blocking + self-join
    * re-ran per read (2.0 s warm in the r6 bench) — behind the barrier
    * it runs once per session. */
  def ngramJaccardPairs(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "ngram_jaccard_pairs")(
      llm.Dedup.ngramJaccardPairs(docShingleKeys(s, d)))
  /** Asymmetric containment pairs — the sub-document-duplication
    * signal symmetric Jaccard hides (short doc inside a long one).
    * Mat'd (r18, the ngram_jaccard_pairs/minhash_pairs precedent):
    * read by its own registered query AND as winnow_recall's exact
    * truth set — without the barrier the rare-shingle blocking +
    * self-join re-ran once per consumer. */
  def ngramContainmentPairs(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "ngram_containment_pairs")(
      llm.Dedup.ngramContainmentPairs(docShingleKeys(s, d)))
  /** LSH banding quality: minhash candidate recall/precision against
    * the exact-Jaccard truth set (both sides read Mat'd pair tables). */
  def dedupLshRecall(s: SparkSession, d: String): DataFrame =
    llm.Dedup.lshRecallStats(ngramJaccardPairs(s, d), minhashPairs(s, d),
      llm.Dedup.LshRecallThreshold)
  /** Exact-substring dedup transform (cross-doc duplicated spans
    * removed, document rebuilt). */
  def substringDedup(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "substring_dedup")(
      llm.Dedup.substringDedup(Tables.documents(s, d)))
  /** Cross-doc shared n-gram fraction over the shingle-key barrier. */
  def docSharedNgrams(s: SparkSession, d: String): DataFrame =
    llm.Dedup.sharedNgramStats(docShingleKeys(s, d))
  /** One-row corpus datasheet: the release-notes rollup (doc/token
    * counts, curation outcome mix, split sizes) composed from the SAME
    * gated component queries. */
  def corpusDatasheet(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, count, lit, sum, when}
    val ts = textStats(s, d).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens_est")).as("total_tokens_est"))
    val cur = corpusCuration(s, d).agg(
      count(when(col("status") === "kept", lit(1))).as("n_kept"),
      count(when(col("status") === "low_quality", lit(1))).as("n_low_quality"),
      count(when(col("status") === "exact_duplicate", lit(1))).as("n_exact_duplicate"),
      count(when(col("status") === "near_duplicate", lit(1))).as("n_near_duplicate"))
    val sp = datasetSplits(s, d).agg(
      count(when(col("split") === "train", lit(1))).as("n_train"),
      count(when(col("split") === "validation", lit(1))).as("n_validation"),
      count(when(col("split") === "test", lit(1))).as("n_test"))
    ts.crossJoin(broadcast(cur)).crossJoin(broadcast(sp))
      // empty-corpus guard (the textStats ratio convention): 0/0 is
      // NaN in Spark but engine-setting-dependent in DuckDB
      .withColumn("kept_frac",
        when(col("n_docs") > 0,
          col("n_kept").cast("double") / col("n_docs").cast("double"))
          .otherwise(lit(0.0)))
  }
  def annCosineTopK(s: SparkSession, d: String): DataFrame =
    llm.Similarity.annCosineTopK(Tables.embeddings(s, d))
  /** MMR-diversified rerank, INDEX-FED (VERDICT r12 #2): candidates
    * come from the kmeans-IVF probe over the Mat'd quantizer at
    * nCand = MmrCandidates — per-request cost is nprobe × list size,
    * never a corpus scan. The exact-fed selection survives only as
    * [[mmrRecall]]'s ground-truth arm. */
  def mmrRerank(s: SparkSession, d: String): DataFrame =
    llm.Similarity.mmrRerankFrom(Tables.embeddings(s, d),
      llm.Similarity.ivfProbeLists(ivfKmeansLists(s, d), kmeansCoarse(s, d),
          llm.Similarity.MmrCandidates)
        .select(col("query_id"), col("neighbor_id"), col("cosine").as("rel")))
  /** Selection recall of the index-fed MMR against the exact-fed MMR
    * (the hybrid_recall pattern one component later): how much of the
    * exact pipeline's diversified top-k the served pipeline keeps —
    * the number that prices the IVF candidate feed. */
  def mmrRecall(s: SparkSession, d: String): DataFrame =
    llm.Similarity.annRecall(
      llm.Similarity.mmrRerank(Tables.embeddings(s, d)),
      mmrRerank(s, d))
  /** Metadata-filtered vector search (predicate BEFORE the top-k). */
  def annFilteredTopK(s: SparkSession, d: String): DataFrame =
    llm.Similarity.annFilteredTopK(Tables.embeddings(s, d))
  def annLshBuckets(s: SparkSession, d: String): DataFrame =
    llm.Similarity.annLshBuckets(Tables.embeddings(s, d))
  def embeddingDedupPairs(s: SparkSession, d: String): DataFrame =
    // Mat'd (r18, the minhash_pairs precedent verbatim): read by its
    // own registered query AND the embedding_dedup_clusters barrier
    // build — the banded self-join ran once per consumer un-Mat'd.
    Mat.table(s, d, "embedding_dedup_pairs")(
      llm.Similarity.embeddingDedupPairs(Tables.embeddings(s, d)))
  /** The label-quantizer centroid table Mat'd (index build runs once
    * per session; the search scans the corpus against the stored
    * 10-row quantizer). */
  private def ivfLabelCentroids(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "ivf_label_centroids")(
      llm.Similarity.labelCentroids(Tables.embeddings(s, d)))
  def annIvfTopK(s: SparkSession, d: String): DataFrame =
    llm.Similarity.annIvfTopK(Tables.embeddings(s, d),
      Some(ivfLabelCentroids(s, d)))
  /** The materialized IVF index: corpus-wide nearest-centroid
    * assignment runs ONCE at index build (the r13 `ivf_kmeans_lists`
    * Mat), serving probes the stored inverted lists — the
    * vector-store deployment shape. Rebuild contract: a refreshed
    * quantizer invalidates the lists (both Mats version together). */
  private def ivfKmeansLists(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "ivf_kmeans_lists")(
      llm.Similarity.ivfLists(Tables.embeddings(s, d), kmeansCoarse(s, d)))
  /** The probe reads the Mat'd inverted lists and the Mat'd kmeans
    * centroid table (both roundtrips bit-exact): per-execution work is
    * query-side centroid ranking + the probed-list scan — the corpus
    * assignment never re-runs at serving time. */
  def annIvfKmeansTopK(s: SparkSession, d: String): DataFrame =
    llm.Similarity.ivfProbeLists(ivfKmeansLists(s, d), kmeansCoarse(s, d))
  /** Cluster-quota diversity sample off the Mat'd kmeans quantizer:
    * semantic-coverage-preserving downsampling. */
  def diversitySample(s: SparkSession, d: String): DataFrame =
    llm.Similarity.diversitySample(Tables.embeddings(s, d),
      llm.Kmeans.vectorsFromExploded(kmeansCentroids(s, d)))
  /** SemDeDup: within-cluster semantic-duplicate pruning. */
  def semdedupPrune(s: SparkSession, d: String): DataFrame =
    llm.Similarity.semDedupPrune(Tables.embeddings(s, d),
      llm.Kmeans.vectorsFromExploded(kmeansCentroids(s, d)))
  /** The composed IVF+PQ index: Mat'd kmeans coarse quantizer + PQ
    * reconstruction off the Mat'd codebooks — both index halves build
    * once per session; the query probes lists and scans codes. */
  private def kmeansCoarse(s: SparkSession, d: String): DataFrame =
    llm.Kmeans.vectorsFromExploded(kmeansCentroids(s, d))
  def annIvfPqTopK(s: SparkSession, d: String): DataFrame =
    llm.Similarity.annIvfPqTopK(Tables.embeddings(s, d),
      kmeansCoarse(s, d), pqReconstructed(s, d))
  /** PQ codebooks trained on the RESIDUALS from the kmeans coarse
    * quantizer (true IndexIVFPQ encoding), Mat'd like pq_codebooks. */
  private def rpqCodebooks(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "rpq_codebooks")(
      llm.PQ.residualCodebooks(Tables.embeddings(s, d), kmeansCoarse(s, d)))
  /** The residual-encoded corpus v̂ = c(v) + dequant(codes(v − c(v))),
    * Mat'd — the IndexIVFPQ scan artifact. */
  private def rpqReconstructed(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "rpq_reconstructed")(
      llm.PQ.residualReconstructed(Tables.embeddings(s, d),
        kmeansCoarse(s, d), rpqCodebooks(s, d)))
  /** IVF+PQ over the residual encoding — the full IndexIVFPQ. */
  def annIvfPqResidualTopK(s: SparkSession, d: String): DataFrame =
    llm.Similarity.annIvfPqTopK(Tables.embeddings(s, d),
      kmeansCoarse(s, d), rpqReconstructed(s, d))
  /** Int8 scalar-quantized embeddings, exploded to (vec_id, pos, q,
    * scale) rows so the differential harness can sort the output (its
    * pandas-side comparison cannot sort an array column — the array
    * shape stays internal via [[llm.Quantize.quantize]]). */
  def embeddingQuantization(s: SparkSession, d: String): DataFrame =
    llm.Quantize.quantizeExploded(Tables.embeddings(s, d))
  /** aHash image signatures from the REAL PNG decode, Mat'd (the
    * pairs query probes the same table). */
  def mediaAHash(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "media_ahash")(
      llm.Multimodal.mediaAHash(s, Tables.documents(s, d)))
  /** Image near-dup pairs via banded Hamming join over the Mat. */
  def mediaAHashPairs(s: SparkSession, d: String): DataFrame =
    llm.Multimodal.aHashPairs(mediaAHash(s, d))
  /** Exact-integer Pearson matrix over embedding dims (anisotropy /
    * whitening diagnostic). */
  def embeddingCorr(s: SparkSession, d: String): DataFrame =
    llm.Quantize.embeddingCorr(Tables.embeddings(s, d))
  /** Top principal component by deterministic quantized power
    * iteration (the whitening/OPQ input embeddingCorr points at).
    * Mat'd like every trained artifact (the bpe_merges/kmeans
    * convention): a store fits its rotation once and serves it; the
    * 6-pass build cost is measured by the scale probe's fresh-alias
    * passes, not re-paid per read. */
  def embeddingPca(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "embedding_pca")(
      llm.Quantize.embeddingPca(Tables.embeddings(s, d)))
  /** The dequantized SQ8 corpus as its OWN Mat barrier (VERDICT r7 #1):
    * a real vector store materializes the compressed index once, it
    * doesn't re-run quantize→dequantize per search. The parquet float
    * roundtrip is bit-exact (the kmeans_centroids precedent), so the
    * search result is unchanged; the allocation-heavy transform chain
    * (two array rebuilds per vector) executes once per session instead
    * of once per execution of ann_sq8_topk AND ann_recall_by_method. */
  private def sq8Corpus(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "sq8_corpus")(
      llm.Quantize.dequantize(llm.Quantize.quantize(Tables.embeddings(s, d))))
  /** Brute-force cosine top-k over the dequantized int8 corpus (the
    * materialized index; symmetric search — queries dequantized too). */
  def annSq8TopK(s: SparkSession, d: String): DataFrame =
    llm.Similarity.annCosineTopK(sq8Corpus(s, d))
  /** The exact brute-force top-k as a STORED result table: recall
    * evaluation reads the same gated search result from a barrier
    * instead of re-running the corpus scan once per compared method
    * (5× inside ann_recall_by_method). The registered ann_cosine_topk
    * query stays LIVE — its bench number must measure the search, not
    * a 50-row table read. */
  private def annExactTopK(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "ann_exact_topk")(
      llm.Similarity.annCosineTopK(Tables.embeddings(s, d)))
  /** Recall@k of the kmeans-quantized IVF index against the exact
    * brute-force top-k — both sides the SAME gated queries. */
  def annRecall(s: SparkSession, d: String): DataFrame =
    llm.Similarity.annRecall(annExactTopK(s, d), annIvfKmeansTopK(s, d))
  /** Recall@k of EVERY approximate index against the exact top-k in
    * one table — the accuracy/cost dashboard an ANN deployment is
    * tuned from. Each method is the SAME gated query composed through
    * the SAME recall operator. */
  def annRecallByMethod(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, lit}
    // All NINE searches still execute live (the r7 discipline — a
    // search query's bench number measures the search); only the
    // recall ACCOUNTING is factored (r19, guide §2.4): one tagged
    // union joins the exact top-k ONCE and one (method, query)
    // aggregation replaces nine separate exact-scans + joins +
    // per-method aggregations. Hit counts are the same exact integers
    // — per method, the inner join matches exactly the approx rows the
    // old per-method left join counted — and queries with zero hits
    // reappear through the method-grid left join (n_hits 0).
    val exact = annExactTopK(s, d)
    val methods = Seq(
      "ivf" -> annIvfTopK(s, d),
      "ivf_kmeans" -> annIvfKmeansTopK(s, d),
      "sq8" -> annSq8TopK(s, d),
      "pq" -> annPqTopK(s, d),
      "pq_adc" -> annPqAdcTopK(s, d),
      "pq_rerank" -> annPqRerankTopK(s, d),
      "ivfpq" -> annIvfPqTopK(s, d),
      "ivfpq_residual" -> annIvfPqResidualTopK(s, d),
      "opq" -> annOpqTopK(s, d))
    val tagged = methods
      .map { case (m, approx) =>
        approx.select(lit(m).as("method"), col("query_id"), col("neighbor_id")) }
      .reduce(_ unionByName _)
    val hits = exact.select(col("query_id"), col("neighbor_id"))
      .join(tagged, Seq("query_id", "neighbor_id"))
      .groupBy("method", "query_id")
      .agg(count(lit(1)).as("n_hits"))
    val perQuery = exact.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"))
    val grid = methods.map { case (m, _) =>
      perQuery.select(lit(m).as("method"), col("query_id"), col("n_exact")) }
      .reduce(_ unionByName _)
    grid.join(broadcast(hits), Seq("method", "query_id"), "left")
      .select(col("method"), col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double")
          / col("n_exact").cast("double")).as("recall"))
  }
  /** Hard negatives: per query the most-confusable wrong-label
    * vectors (contrastive-training mining). */
  def annHardNegatives(s: SparkSession, d: String): DataFrame =
    llm.Similarity.annHardNegatives(Tables.embeddings(s, d))
  /** Matryoshka truncation eval: recall of prefix-dim brute-force
    * search vs the full-dim exact top-k, per MRL dim. */
  def annMatryoshkaRecall(s: SparkSession, d: String): DataFrame =
    llm.Similarity.annMatryoshkaRecall(Tables.embeddings(s, d), annExactTopK(s, d))
  /** Transitive clusters over the embedding-cosine near-dup pairs —
    * the semantic-dedup twin of [[dedupClusters]], through the SAME
    * connected-components operator. */
  def embeddingDedupClusters(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    // Mat'd like dedup_clusters: the 8 eagerly-checkpointed propagation
    // rounds execute once at barrier build, not per consumer read (the
    // un-Mat'd form was the slowest query of the r6 bench at 7.7 s warm
    // — all fixed per-round job cost)
    Mat.table(s, d, "embedding_dedup_clusters")(
      llm.Clusters.connectedComponents(
        embeddingDedupPairs(s, d)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
        .select(col("doc_id").as("vec_id"), col("cluster_id"), col("cluster_size")))
  }
  /** Deterministic epoch-0 corpus shuffle order (two-phase global
    * index — no single-partition window over the corpus). */
  def epochShuffle(s: SparkSession, d: String): DataFrame =
    operators.GlobalIndex.epochShuffle(Tables.documents(s, d))
  def textStats(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "text_stats")(llm.TextStats.textStats(Tables.documents(s, d)))
  /** Grouped top-k over the text_stats barrier via the bounded-heap
    * TopKAggregate (partial-merge ObjectHashAggregate, not a window
    * sort). */
  def topDocsPerLang(s: SparkSession, d: String): DataFrame =
    llm.TextStats.topDocsPerLang(textStats(s, d))
  /** Language-ID heuristic accuracy vs the labeled lang column. */
  def langConfusion(s: SparkSession, d: String): DataFrame =
    llm.TextStats.langConfusion(Tables.documents(s, d), textStats(s, d))
  /** Near-dup pairs straddling split boundaries (eval leakage). */
  def splitLeakage(s: SparkSession, d: String): DataFrame =
    llm.Splits.leakageAudit(dedupClusters(s, d), datasetSplits(s, d))
  /** Which sources copy from each other: cross-source near-dup matrix. */
  def sourceDupMatrix(s: SparkSession, d: String): DataFrame =
    llm.Splits.crossGroupDupMatrix(dedupClusters(s, d),
      Tables.documents(s, d), "source")
  /** Transitive near-dup clusters over the union of MinHash+SimHash
    * pair edges — Mat'd: the 8-round propagation plan executes once,
    * then its own query AND the curation pipeline read the barrier. */
  def dedupClusters(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "dedup_clusters")(llm.Clusters.connectedComponents(
      llm.Clusters.nearDupEdges(minhashPairs(s, d), simhashPairs(s, d))))
  /** End-to-end curation pipeline over the shared dedup/stats models.
    * Every expensive input is a Mat barrier (text_stats, exact groups
    * from raw documents, dedup_clusters ← minhash/simhash pairs), so a
    * curation run is joins over materialized tables, not re-executions
    * of the corpus passes (VERDICT r3 "What's wrong" #2). */
  def corpusCuration(s: SparkSession, d: String): DataFrame =
    llm.Curation.curate(Tables.documents(s, d), textStats(s, d),
      dedupExact(s, d), dedupClusters(s, d))
  /** Per-(source, status) curation rollup — which crawl is polluted. */
  def curationReport(s: SparkSession, d: String): DataFrame =
    llm.Curation.curationReport(Tables.documents(s, d), corpusCuration(s, d))
  def mediaFeatures(s: SparkSession, d: String): DataFrame =
    llm.Multimodal.mediaFeatures(s, Tables.documents(s, d))
  def mediaResized(s: SparkSession, d: String): DataFrame =
    llm.Multimodal.mediaResized(s, Tables.documents(s, d))
  def mediaFrames(s: SparkSession, d: String): DataFrame =
    llm.Multimodal.mediaFrames(Tables.documents(s, d))
  def datasetSplits(s: SparkSession, d: String): DataFrame =
    llm.Splits.assign(Tables.documents(s, d))
  /** Neyman vs proportional sample-budget allocation by stratum. */
  def neymanAllocation(s: SparkSession, d: String): DataFrame =
    llm.Splits.neymanAllocation(Tables.documents(s, d))
  def piiRedaction(s: SparkSession, d: String): DataFrame =
    llm.Redaction.piiRedaction(Tables.documents(s, d))
  def piiRedactionShapes(s: SparkSession, d: String): DataFrame =
    llm.Redaction.piiRedactionShapes(Tables.documents(s, d))
  /** Shares the Mat'd distinct shingle-key table with the Jaccard path. */
  def decontamination(s: SparkSession, d: String): DataFrame =
    llm.Decontam.contamination(Tables.documents(s, d), docShingleKeys(s, d))
  /** Shares the Mat'd shingle explosion with MinHash/Jaccard. */
  def docRepetition(s: SparkSession, d: String): DataFrame =
    llm.Repetition.repetitionStats(Tables.documents(s, d), docShingles(s, d))
  def domainMixture(s: SparkSession, d: String): DataFrame =
    llm.Mixture.domainMixture(Tables.documents(s, d))
  /** T=2 temperature mixture: targets derived from the observed
    * distribution (share ∝ sqrt(n)), exact integer arithmetic. */
  def mixtureTemperature(s: SparkSession, d: String): DataFrame =
    llm.Mixture.mixtureTemperature(Tables.documents(s, d))
  /** UniMax water-filled char budget per language: tail languages cap
    * at MaxEpochs, head languages split the rest evenly. */
  def unimaxAllocation(s: SparkSession, d: String): DataFrame =
    llm.Mixture.unimaxBudget(Tables.documents(s, d))
  def docChunks(s: SparkSession, d: String): DataFrame =
    llm.Chunking.chunks(Tables.documents(s, d))
  /** Per-doc share of chunks verbatim-shared with OTHER docs (the
    * paragraph-granularity boilerplate signal). */
  def chunkBoilerplate(s: SparkSession, d: String): DataFrame =
    llm.Chunking.boilerplateShare(docChunks(s, d))
  def cmsHeavyHitters(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, explode}
    operators.Sketches.cmsHeavyHitters(
      Tables.documents(s, d)
        .select(explode(llm.Dedup.words(col("text"))).as("term")),
      col("term"), "term", operators.Sketches.CmsHeavyThreshold)
  }
  def kmeansCentroids(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "kmeans_centroids")(llm.Kmeans.centroids(Tables.embeddings(s, d)))
  /** PQ codebooks Mat'd: the 4-subspace Lloyd training executes once;
    * both the codes query and the PQ ANN read the barrier (parquet
    * float roundtrip is bit-exact). */
  def pqCodebooks(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "pq_codebooks")(llm.PQ.codebooks(Tables.embeddings(s, d)))
  def pqCodes(s: SparkSession, d: String): DataFrame =
    llm.PQ.codes(Tables.embeddings(s, d), pqCodebooks(s, d))
  /** The PQ-reconstructed corpus as a Mat barrier — THE index artifact
    * every PQ-family search scans. At 100 TB the compressed corpus is
    * built once at index time and persisted; rebuilding it inside each
    * query (codes join + per-vector reassembly) was the dominant cost
    * of all four PQ searches. Parquet float roundtrip is bit-exact
    * (the sq8_corpus precedent), so the oracle contract is unchanged. */
  private def pqReconstructed(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "pq_reconstructed")(
      llm.PQ.reconstructed(Tables.embeddings(s, d), pqCodebooks(s, d)))
  def annPqTopK(s: SparkSession, d: String): DataFrame =
    llm.Similarity.annCosineTopK(pqReconstructed(s, d))
  def annPqAdcTopK(s: SparkSession, d: String): DataFrame =
    llm.Similarity.annCosineTopKAsym(pqReconstructed(s, d), Tables.embeddings(s, d))
  /** ADC top-C candidates exact-rescored against the raw corpus — the
    * two-stage refine search over the same Mat'd reconstruction. */
  def annPqRerankTopK(s: SparkSession, d: String): DataFrame =
    llm.PQ.rerankFromReconstructed(pqReconstructed(s, d), Tables.embeddings(s, d))
  /** Top-[[llm.Quantize.PcaTopK]] PCA basis Mat'd (the trained
    * rotation artifact — bpe_merges convention; closes the OPQ loop
    * embedding_corr/embedding_pca promise). */
  def embeddingPcaTopK(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "embedding_pca_topk")(
      llm.Quantize.embeddingPcaTopK(Tables.embeddings(s, d)))
  /** The PCA-ROTATED corpus (16 dims, float) as its own Mat barrier —
    * the OPQ index's input, built once like sq8_corpus. */
  private def opqCorpus(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "opq_corpus")(
      llm.Quantize.pcaProject(Tables.embeddings(s, d),
        embeddingPcaTopK(s, d)))
  /** OPQ codebooks: the SAME Lloyd training over the rotated corpus at
    * 4 subspaces × 4 dims — the same 4×3-bit code budget as raw PQ. */
  private def opqCodebooks(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "opq_codebooks")(
      llm.PQ.codebooks(opqCorpus(s, d), llm.PQ.SubSpaces,
        llm.Quantize.PcaTopK / llm.PQ.SubSpaces))
  /** The OPQ-reconstructed corpus Mat'd (the pq_reconstructed
    * convention — the compressed index artifact). */
  private def opqReconstructed(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "opq_reconstructed")(
      llm.PQ.reconstructed(opqCorpus(s, d), opqCodebooks(s, d),
        llm.PQ.SubSpaces, llm.Quantize.PcaTopK / llm.PQ.SubSpaces))
  /** OPQ search: symmetric cosine top-k over the rotated+PQ-compressed
    * corpus at equal code budget to raw PQ — the recall row answers
    * what the rotation buys, measured (on this near-isotropic test
    * corpus the honest expectation is "little", exactly what
    * embedding_corr's anisotropy diagnostic predicts; on a trained-
    * embedding corpus with a dominant cone it pays). */
  def annOpqTopK(s: SparkSession, d: String): DataFrame =
    llm.Similarity.annCosineTopK(opqReconstructed(s, d))
  def bm25Scores(s: SparkSession, d: String): DataFrame =
    llm.Relevance.bm25(Tables.documents(s, d))
  def sessionize(s: SparkSession, d: String): DataFrame =
    operators.Sessions.sessionize(Tables.events(s, d))
  def eventsAsofPurchase(s: SparkSession, d: String): DataFrame =
    marts.EventMarts.eventsAsofPurchase(Tables.events(s, d))
  def valueBandStats(s: SparkSession, d: String): DataFrame =
    marts.EventMarts.valueBandStats(s, Tables.events(s, d))
  def hllUserCounts(s: SparkSession, d: String): DataFrame =
    marts.EventMarts.hllUserCounts(Tables.events(s, d))
  /** Per-type HLL sketches merged register-wise into the global
    * distinct-user estimate (sketch mergeability, oracle-gated). */
  def hllMergedUsers(s: SparkSession, d: String): DataFrame =
    marts.EventMarts.hllMergedUsers(Tables.events(s, d))
  /** Sketch set algebra: estimated click∩purchase user overlap by
    * inclusion-exclusion over three deterministic HLLs. */
  def hllOverlapUsers(s: SparkSession, d: String): DataFrame =
    marts.EventMarts.hllOverlapUsers(Tables.events(s, d))
  /** The persisted daily register table (the sketch mart). */
  private def hllDayRegisters(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "hll_day_registers")(
      marts.EventMarts.hllDayRegisters(Tables.events(s, d)))
  /** Date-range distinct users by merging the STORED daily sketches —
    * the estimate path never rescans events. */
  def hllRangeUsers(s: SparkSession, d: String): DataFrame =
    marts.EventMarts.hllRangeUsers(Tables.events(s, d), hllDayRegisters(s, d))
  def valuePercentiles(s: SparkSession, d: String): DataFrame =
    marts.EventMarts.valuePercentiles(Tables.events(s, d))
  def eventFunnel(s: SparkSession, d: String): DataFrame =
    operators.Funnel.funnel(Tables.events(s, d))
  /** The histogram quantizer (per-type bin edges) Mat'd (r18, trained-
    * artifact convention): read by the batch quantile query AND pinned
    * by the streaming histogram twin — previously each bench pass of
    * the stream re-trained and re-wrote it pass-scoped. */
  private def histPinnedStats(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    Mat.table(s, d, "hist_pinned_stats")(
      operators.Sketches.histStats(
        Tables.events(s, d).filter(col("value").isNotNull),
        Seq("event_type"), col("value")))
  }
  def histQuantiles(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val nonNull = Tables.events(s, d).filter(col("value").isNotNull)
    val stats = histPinnedStats(s, d)
    operators.Sketches.histQuantilesFromBins(
      operators.Sketches.histBinCounts(nonNull, Seq("event_type"),
        col("value"), stats),
      stats, Seq("event_type"))
  }
  /** Top-3 tf-idf terms per doc — Mat'd: read by its own query AND
    * hybrid_search's lexical arm (two consumers, one tokenization). */
  def tfidfTopTerms(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "tfidf_top_terms")(
      llm.Relevance.tfidfTopTerms(Tables.documents(s, d)))
  /** Feature-hashed document embeddings (long format) — Mat'd: read
    * by its own query, the quality classifier (training AND scoring),
    * and hybrid_search's semantic arm; without the barrier each
    * consumer re-tokenizes the corpus. */
  def hashedEmbeddings(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "doc_embeddings")(
      llm.HashEmbed.hashedEmbeddings(Tables.documents(s, d)))
  /** Trained quality-classifier weight trajectory — Mat'd: training
    * (3 full-batch rounds over the corpus) runs once per session, the
    * prediction query reads the barrier (the kmeans/PQ index-build
    * convention). */
  def qualityWeights(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "quality_weights")(
      llm.QualityModel.trainedWeights(s, Tables.documents(s, d), textStats(s, d),
        hashedEmbeddings(s, d)))
  /** Corpus scored by the trained model's final round — Mat'd: read by
    * its own query, the model card (quality_eval), and the calibration
    * table, and the calibration's bucket self-join would otherwise run
    * the margin pipeline twice. */
  def qualityPredictions(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "quality_predictions")(
      llm.QualityModel.predictions(Tables.documents(s, d), textStats(s, d),
        qualityWeights(s, d), hashedEmbeddings(s, d)))
  /** One-row model card for the trained classifier: confusion counts,
    * accuracy/precision/recall/F1, exact-rank-sum ROC-AUC. */
  def qualityEval(s: SparkSession, d: String): DataFrame =
    llm.QualityModel.evaluation(qualityPredictions(s, d))
  /** Reliability table: margin-decile buckets vs empirical positive
    * rate (the calibration check behind any keep/drop threshold). */
  def qualityCalibration(s: SparkSession, d: String): DataFrame =
    llm.QualityModel.calibration(qualityPredictions(s, d))
  /** Split-conformal prediction sets (coverage + set size) over the
    * classifier's margins. */
  def qualityConformal(s: SparkSession, d: String): DataFrame =
    llm.QualityModel.conformal(qualityPredictions(s, d))
  /** STREAMING inference: new-doc batches scored per micro-batch
    * against the standing trained-weights mart. */
  def streamQualityScores(s: SparkSession, d: String): DataFrame =
    streaming.Streams.qualityScoreStreamOnce(s, d, qualityWeights(s, d))
  /** The term-keyed postings Mat (term, doc_id, tf, dl) — the lexical
    * inverted index; term-bucketed so per-term rollups (df) are
    * shuffle-free for every reader. */
  private[graft] def hybridPostings(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "hybrid_postings", bucketBy = Some(("term", 8)))(
      llm.HashEmbed.postings(Tables.documents(s, d)))
  /** One-row corpus stats (n_docs, total_len) Mat — BM25's broadcast
    * denominators, computed once per corpus version. */
  private[graft] def hybridCorpusStats(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "hybrid_corpus_stats")(
      llm.HashEmbed.corpusStats(Tables.documents(s, d)))
  /** IMPACT-SCORED postings Mat (term, doc_id, s): BM25 score folded
    * into the index at build time — a serving request pays zero score
    * arithmetic (df/idf/avgdl are corpus constants per version). */
  private[graft] def hybridImpact(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "hybrid_impact", bucketBy = Some(("term", 8)))(
      llm.HashEmbed.impactPostings(hybridPostings(s, d), hybridCorpusStats(s, d)))
  /** Dense hashed vectors + norms Mat — doc_id-bucketed so the
    * candidate→vector re-rank join never shuffles the corpus side. */
  private[graft] def semVectors(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "sem_vectors", bucketBy = Some(("doc_id", 8)))(
      llm.HashEmbed.vectors(hashedEmbeddings(s, d)))
  /** The semantic LSH band index Mat (doc_id, band, bkt) — the
    * inverted lists a query probes. */
  private[graft] def semBandIndex(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "sem_band_index")(
      llm.HashEmbed.semBandTable(semVectors(s, d)))
  /** The STANDING-corpus (doc_id % 5 != 0) band index under its own
    * pinned centering stats — the index state the streaming
    * maintenance loop appends to. Postings/vectors of the standing
    * corpus need no separate Mats: they are doc_id-filterable slices
    * of the full barriers. */
  private[graft] def semBandIndexStanding(s: SparkSession, d: String): DataFrame = {
    val standVecs = semVectors(s, d).filter(col("doc_id") % 5 =!= 0)
    Mat.table(s, d, "sem_band_index_standing")(
      llm.HashEmbed.semBandTable(standVecs, llm.HashEmbed.semStats(standVecs)))
  }
  /** STREAMING hybrid-index maintenance, then serving from the
    * stream-maintained parts — gated against the batch-built index
    * with the same pinned standing-corpus quantizer. */
  def streamHybridIndex(s: SparkSession, d: String): DataFrame = {
    val standVecs = semVectors(s, d).filter(col("doc_id") % 5 =!= 0)
    streaming.Streams.hybridIndexMaintenanceOnce(s, d,
      standingPostings = hybridPostings(s, d).filter(col("doc_id") % 5 =!= 0),
      standingVecs = standVecs,
      standingBands = semBandIndexStanding(s, d),
      pinnedStats = llm.HashEmbed.semStats(standVecs),
      topTerms = tfidfTopTerms(s, d),
      corpusStats = hybridCorpusStats(s, d))
  }
  /** Hybrid BM25 ⊕ hashed-cosine retrieval fused by RRF — INDEX-SERVED
    * (VERDICT r11 #1): both arms probe Mat'd inverted indexes; nothing
    * scans the corpus per query batch. */
  def hybridSearch(s: SparkSession, d: String): DataFrame =
    llm.HashEmbed.hybridSearch(tfidfTopTerms(s, d), hybridImpact(s, d),
      semVectors(s, d), semBandIndex(s, d))
  /** The bounded-sample INDEX-SERVED fused list as a STORED result
    * table (the [[annExactTopK]] convention, r18): BOTH hybrid eval
    * harnesses (recall + rank metrics) compare the same gated search
    * result, so it is computed once behind a barrier instead of once
    * per harness. The registered hybrid_search query stays LIVE. */
  private def hybridEvalIndexed(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "hybrid_eval_indexed")(
      llm.HashEmbed.hybridSearch(tfidfTopTerms(s, d), hybridImpact(s, d),
        semVectors(s, d), semBandIndex(s, d), llm.HashEmbed.RecallQueryBound))
  /** The bounded-sample EXACT full-scan fused baseline, stored once
    * for the same reason ([[annExactTopK]]: a recall evaluation reads
    * the stored gated result, it does not re-run the corpus scan per
    * consumer). */
  private def hybridEvalExact(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "hybrid_eval_exact")(
      llm.HashEmbed.hybridSearchExact(tfidfTopTerms(s, d), hybridImpact(s, d),
        semVectors(s, d), llm.HashEmbed.RecallQueryBound))
  /** Fused-RRF recall of the index-served plan vs the exact full-scan
    * baseline, over the recall harness's bounded query sample. */
  def hybridRecall(s: SparkSession, d: String): DataFrame =
    llm.HashEmbed.hybridRecall(hybridEvalIndexed(s, d), hybridEvalExact(s, d))
  /** nDCG@5 + MRR of the index-served fused list vs the exact one —
    * order-sensitive serving quality over the recall sample. */
  def hybridRankMetrics(s: SparkSession, d: String): DataFrame =
    llm.HashEmbed.hybridRankMetrics(hybridEvalIndexed(s, d), hybridEvalExact(s, d))
  /** Pseudo-relevance-feedback expanded retrieval: round 1 over the
    * impact index, expansion terms from the feedback docs' keyword
    * Mat, weighted round 2 — per-request cost stays bounded by
    * (terms × ImpactCap) postings. */
  def prfSearch(s: SparkSession, d: String): DataFrame =
    llm.Prf.prfSearch(tfidfTopTerms(s, d), hybridImpact(s, d))
  /** Mat'd: read by its own query AND the curriculum binning. */
  def docSurprisal(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "doc_surprisal")(
      llm.Relevance.unigramSurprisal(Tables.documents(s, d)))
  /** Heaps'-law vocabulary growth by corpus decile. */
  def vocabGrowth(s: SparkSession, d: String): DataFrame =
    llm.TextStats.vocabGrowth(Tables.documents(s, d))
  /** Canonical Gopher rule-filter battery, all-integer evaluation. */
  def gopherRules(s: SparkSession, d: String): DataFrame =
    llm.TextStats.gopherRules(Tables.documents(s, d))
  /** Quality–length Pareto frontier over the corpus (skyline). */
  def qualityPareto(s: SparkSession, d: String): DataFrame =
    llm.Selection.qualityPareto(Tables.documents(s, d),
      qualityPredictions(s, d))
  /** Moore–Lewis cross-entropy-difference data selection. */
  def mooreLewisSelection(s: SparkSession, d: String): DataFrame =
    llm.Selection.mooreLewis(Tables.documents(s, d))
  /** Winnowing (MOSS) fingerprints — Mat'd: read by its own query AND
    * the shared-docs pair stage. */
  def winnowFingerprints(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "winnow_fps")(
      llm.Winnow.fingerprints(Tables.documents(s, d)))
  /** Partial-overlap candidates from shared winnowed fingerprints.
    * Mat'd (r18, same precedent): read by its own registered query AND
    * winnow_recall's detected side. */
  def winnowSharedDocs(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "winnow_shared_docs")(
      llm.Winnow.sharedDocs(winnowFingerprints(s, d)))
  /** Winnowing detection quality vs the exact containment truth set
    * (the dedup_lsh_recall pattern: recall/precision, one row). */
  def winnowRecall(s: SparkSession, d: String): DataFrame =
    llm.Dedup.pairRecallStats(
      ngramContainmentPairs(s, d).select("doc_a", "doc_b"),
      winnowSharedDocs(s, d).select("doc_a", "doc_b"))
  /** Per-ingest batch novelty vs the standing corpus's shingle set. */
  def batchNovelty(s: SparkSession, d: String): DataFrame =
    llm.Dedup.batchNovelty(docShingles(s, d))
  /** DSIR hashed-n-gram importance weights (target = one source). */
  def dsirWeights(s: SparkSession, d: String): DataFrame =
    llm.Selection.dsirWeights(Tables.documents(s, d))
  /** Gap-filled hourly metric series with LOCF carry. */
  def eventsLocfHourly(s: SparkSession, d: String): DataFrame =
    marts.EventMarts.locfHourly(Tables.events(s, d))
  /** CUBE grouping-sets rollup over the raw lineitem fact. */
  def lineitemCube(s: SparkSession, d: String): DataFrame =
    marts.AnalyticsMarts.lineitemCube(Tables.lineitem(s, d))
  /** CMS inner-product join-size estimate for the skewed
    * lineitem ⋈ lineitem self-join on part key, priced against the
    * exact Σ c² answer — the optimizer's cardinality-estimation
    * primitive as a sketch query. */
  def joinSizeEstimate(s: SparkSession, d: String): DataFrame =
    operators.Sketches.joinSizeEstimate(
      Tables.lineitem(s, d).select("l_partkey"),
      Tables.lineitem(s, d).select("l_partkey"), "l_partkey")
  /** Bigram collocation mining by micro-unit lift (ln-free PMI rank). */
  def collocationLift(s: SparkSession, d: String): DataFrame =
    llm.TextStats.collocationLift(Tables.documents(s, d))
  /** Held-out LM eval: Laplace-smoothed unigram model from the train
    * split scoring the validation split (no leakage by construction). */
  def heldoutSurprisal(s: SparkSession, d: String): DataFrame =
    llm.Relevance.heldoutSurprisal(Tables.documents(s, d))
  /** Mat'd: the corpus bigram model re-trained per read otherwise
    * (1.9 s warm in the r6 bench). */
  def bigramSurprisalMat(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "bigram_surprisal")(
      llm.Relevance.bigramSurprisal(Tables.documents(s, d)))
  /** Interpolated Kneser–Ney bigram model table (the smoothed
    * replacement for the MLE bigram table above). */
  def kneserNeyBigrams(s: SparkSession, d: String): DataFrame =
    llm.Relevance.kneserNeyBigrams(Tables.documents(s, d))
  /** Difficulty quartile per document via the histogram-quantile
    * sketch over the Mat'd surprisal (curriculum learning order). */
  def curriculumBins(s: SparkSession, d: String): DataFrame =
    llm.Curriculum.bins(docSurprisal(s, d))
  def streamWindowedCounts(s: SparkSession, d: String): DataFrame =
    streaming.Streams.windowedEventCountsOnce(s, d)
  def streamSessions(s: SparkSession, d: String): DataFrame =
    streaming.Streams.sessionsOnce(s, d)
  def streamSegmentCounts(s: SparkSession, d: String): DataFrame =
    streaming.Streams.segmentCountsOnce(s, d, stgCustomers(s, d))
  def streamDedup(s: SparkSession, d: String): DataFrame =
    streaming.Streams.ingestDedupOnce(s, d)
  def streamAttribution(s: SparkSession, d: String): DataFrame =
    streaming.Streams.clickAttributionOnce(s, d)
  def streamAttributionOuter(s: SparkSession, d: String): DataFrame =
    streaming.Streams.clickAttributionOuterOnce(s, d)
  def streamSinkParquet(s: SparkSession, d: String): DataFrame =
    streaming.Streams.parquetSinkOnce(s, d)
  def streamSinkMerge(s: SparkSession, d: String): DataFrame =
    streaming.Streams.mergeSinkOnce(s, d)
  /** transformWithState (Spark 4 arbitrary-state API) per-user rollup. */
  def streamUserRollup(s: SparkSession, d: String): DataFrame =
    streaming.Streams.userRollupStateOnce(s, d)
  // Two-delivery (time-split) variants: cross-batch state handoff
  // under the same batch-twin oracles (VERDICT r12 #3).
  def streamSessionsMultibatch(s: SparkSession, d: String): DataFrame =
    streaming.Streams.sessionsMultiBatchOnce(s, d)
  def streamSegmentCountsMultibatch(s: SparkSession, d: String): DataFrame =
    streaming.Streams.segmentCountsMultiBatchOnce(s, d, stgCustomers(s, d))
  def streamAttributionMultibatch(s: SparkSession, d: String): DataFrame =
    streaming.Streams.clickAttributionMultiBatchOnce(s, d)
  def streamUserRollupMultibatch(s: SparkSession, d: String): DataFrame =
    streaming.Streams.userRollupMultiBatchOnce(s, d)
  def streamDedupMultibatch(s: SparkSession, d: String): DataFrame =
    streaming.Streams.ingestDedupMultiBatchOnce(s, d)
  def stratifiedEvents(s: SparkSession, d: String): DataFrame =
    marts.EventMarts.stratifiedEvents(Tables.events(s, d))
  def eventsAsofNextPurchase(s: SparkSession, d: String): DataFrame =
    marts.EventMarts.eventsAsofNextPurchase(Tables.events(s, d))
  /** The distinct-purchasers build dim as a Mat barrier (VERDICT r7
    * #2): buildBloom's driver-side aggregation job reads a tiny
    * materialized table instead of re-running the distinct over events
    * on every execution. */
  private def eventPurchasers(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "event_purchasers")(
      marts.EventMarts.purchaserDim(Tables.events(s, d)))
  def bloomPrunedStats(s: SparkSession, d: String): DataFrame =
    marts.EventMarts.bloomPrunedStats(Tables.events(s, d), eventPurchasers(s, d))
  def zorderKeys(s: SparkSession, d: String): DataFrame =
    marts.EventMarts.zorderKeys(Tables.events(s, d))
  /** Per-file min/max stats catalog of the zkey-sorted layout. */
  def zorderZonemaps(s: SparkSession, d: String): DataFrame =
    // Mat'd (r18): the zonemap is a layout-catalog artifact read by its
    // own registered query AND the layout_locality shoot-out.
    Mat.table(s, d, "zorder_zonemaps")(
      marts.EventMarts.zorderZonemaps(Tables.events(s, d)))
  /** Hilbert layout key over the same (value, day) buckets. */
  def hilbertKeys(s: SparkSession, d: String): DataFrame =
    marts.EventMarts.hilbertKeys(Tables.events(s, d))
  /** Zone maps of the Hilbert-ordered layout (Mat'd, same rationale). */
  def hilbertZonemaps(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "hilbert_zonemaps")(
      marts.EventMarts.hilbertZonemaps(Tables.events(s, d)))
  /** Files-scanned shoot-out: Z-order vs Hilbert zonemaps. */
  def layoutLocality(s: SparkSession, d: String): DataFrame =
    marts.EventMarts.layoutLocality(zorderZonemaps(s, d),
      hilbertZonemaps(s, d))

  /** Distinct product pairs co-purchased in some order — the edge
    * table of the co-purchase graph, Mat'd: the group self-join runs
    * once per session, and both the edge query and the BFS read the
    * materialized 8-byte pair table. */
  private def copurchaseEdges(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "copurchase_edges")(
      operators.Graph.coOccurrenceEdges(stgOrderItems(s, d),
        "order_id", "product_id"))
  def productCopurchaseEdges(s: SparkSession, d: String): DataFrame =
    copurchaseEdges(s, d)
  /** Weight-thresholded affinity edges — Mat'd index-build like the
    * distance table; the triangle query's wedge joins read 8-byte pair
    * rows, never the order fact. */
  private def copurchaseStrongEdges(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "copurchase_strong_edges")(
      operators.Graph.strongCoOccurrenceEdges(stgOrderItems(s, d),
        "order_id", "product_id", Models.CoPurchaseMinWeight))
  /** Per-node triangle counts on the strong-edge graph (ordered wedge
    * join over the Mat'd pair table). */
  def copurchaseTriangles(s: SparkSession, d: String): DataFrame =
    operators.Graph.triangleCounts(copurchaseStrongEdges(s, d))
  /** Widest-path bottleneck capacities from the strong-edge HUB
    * (highest strong degree, ties to the smallest id — the min-src
    * convention left a near-isolated source at sf0.1) — max-min
    * relaxation over the Mat'd weighted pair table (the bfsDistances
    * Mat convention: rounds run once at index-build time, the
    * registered query scans the result). */
  def copurchaseBottleneck(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "copurchase_bottleneck") {
      import org.apache.spark.sql.functions.col
      val edges = copurchaseStrongEdges(s, d)
      val src = operators.Graph.undirectedDegrees(edges)
        .orderBy(col("degree").desc, col("node"))
        .limit(1).select("node")
      operators.Graph.widestPaths(edges, src, Models.BottleneckRounds)
    }
  /** Local clustering coefficients on the same strong-edge graph. */
  def copurchaseClustering(s: SparkSession, d: String): DataFrame =
    operators.Graph.clusteringCoefficients(copurchaseStrongEdges(s, d))
  /** Fixed-point PageRank over the full co-purchase graph — Mat'd
    * iterative build like the BFS distances. */
  def copurchasePagerank(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "copurchase_pagerank")(
      operators.Graph.pageRank(copurchaseEdges(s, d), Models.PageRankRounds))
  /** Personalized PageRank from the modular seed set — the
    * random-walk-with-restart recommender, Mat'd like PageRank. */
  def copurchasePpr(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "copurchase_ppr")(
      operators.Graph.personalizedPageRank(copurchaseEdges(s, d),
        Models.PageRankRounds))
  /** DIRECTED PageRank (low→high co-purchase orientation) with
    * dangling-mass redistribution — nodes with no larger co-purchased
    * neighbor are genuine dangling sinks here. */
  def copurchasePagerankDirected(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "copurchase_pagerank_directed")(
      operators.Graph.pageRankDirected(copurchaseEdges(s, d), Models.PageRankRounds))
  /** k-core peel of the strong-edge graph (the density cut before
    * community work) — Mat'd iterative build like PageRank/LPA. */
  def copurchaseKcore(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "copurchase_kcore")(
      operators.Graph.kCore(copurchaseStrongEdges(s, d).select("src", "dst"),
        Models.KCoreK, Models.KCoreRounds))
  /** Label-propagation communities on the STRONG-edge affinity graph
    * (the full graph is near-one-component; communities only mean
    * something after thresholding) — Mat'd iterative build. */
  def copurchaseCommunities(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "copurchase_communities")(
      operators.Graph.labelPropagationWithSizes(
        copurchaseStrongEdges(s, d).select("src", "dst"),
        Models.LpaRounds))
  /** CLOSENESS + HARMONIC centrality over the strong graph within
    * BfsMaxHops (Bavelas 1950; Marchiori & Latora 2000): all-pairs
    * hop distances through [[graft.operators.Graph.allPairsHopDistances]],
    * then per node the bounded-radius closeness reach/Σdist and the
    * exact-rational harmonic sum — with hops ≤ 4, Σ 1/d =
    * (12·n₁ + 6·n₂ + 4·n₃ + 3·n₄)/12, an EXACT int numerator (no
    * engine-ordered double sum), divided once at the boundary. */
  def copurchaseCloseness(s: SparkSession, d: String): DataFrame = Mat.table(s, d, "copurchase_closeness") {
    // Mat'd (r18): the bounded-round all-pairs BFS is an iterative
    // index build (the pagerank/kcore barrier convention) and TWO
    // registered queries read the closeness table — this one and the
    // closeness_approx_error harness; un-Mat'd, each re-ran the
    // 4-round checkpoint chain per pass.
    import org.apache.spark.sql.functions._
    val dists = operators.Graph.allPairsHopDistances(
      copurchaseStrongEdges(s, d).select("src", "dst"), Models.BfsMaxHops)
    dists.where(col("dist") > 0)
      .groupBy(col("root").as("node"))
      .agg(
        count(lit(1)).as("reach_n"),
        sum(col("dist").cast("long")).as("dist_sum"),
        count(when(col("dist") === 1, 1)).as("d1_n"),
        count(when(col("dist") === 2, 1)).as("d2_n"),
        count(when(col("dist") === 3, 1)).as("d3_n"),
        count(when(col("dist") === 4, 1)).as("d4_n"))
      .withColumn("harmonic_x12",
        lit(12L) * col("d1_n") + lit(6L) * col("d2_n")
          + lit(4L) * col("d3_n") + lit(3L) * col("d4_n"))
      .select(col("node"), col("reach_n"), col("dist_sum"),
        col("d1_n"), col("d2_n"), col("d3_n"), col("d4_n"),
        (col("reach_n").cast("double") / col("dist_sum").cast("double"))
          .as("closeness"),
        col("harmonic_x12"),
        (col("harmonic_x12").cast("double") / 12.0).as("harmonic"))
  }
  /** Hub-CAPPED triangle counts on the RAW co-purchase graph — the
    * honesty-hatch registration the r15 verdict asked for: counts are
    * EXACT over the subgraph of nodes with degree ≤ [[TriangleHubCap]];
    * hubs report NULL (uncounted, flagged) and every kept node reports
    * how many hub neighbors its count could be missing through. On a
    * power-law crawl graph this is the knob that removes the wedge
    * tail wholesale; wedge fan-out is bounded by |kept-edges|·cap. */
  def copurchaseTrianglesCapped(s: SparkSession, d: String): DataFrame =
    // Mat'd (r18): the capped wedge join is a graph index build of the
    // same family as copurchase_distances / pagerank / kcore, and TWO
    // registered raw-graph queries read its output (this one and the
    // clustering projection) — behind the barrier it runs once per
    // session instead of once per consumer.
    Mat.table(s, d, "copurchase_triangles_capped")(
      operators.Graph.triangleCountsCapped(copurchaseEdges(s, d),
        Models.TriangleHubCap))
  /** DOULION edge-sampled triangle ESTIMATES on the RAW co-purchase
    * graph — the scale path the exact operator cannot serve there
    * (O(E^1.5) is inherent to exact counting; the r15 probe measured
    * 22.8× time at 8× edges): keep_den derives from
    * [[TriangleEdgeBudget]], so the sampled wedge work is budget-bounded
    * at ANY corpus scale and the per-node count/p³ estimates are
    * unbiased. Priced by [[trianglesApproxError]]. */
  def copurchaseTrianglesApprox(s: SparkSession, d: String): DataFrame =
    // Mat'd (r18): same barrier rationale — the budget-sampled wedge
    // join feeds this query AND the sampled-clustering projection.
    Mat.table(s, d, "copurchase_triangles_approx")(
      operators.Graph.triangleCountsSampledBudget(copurchaseEdges(s, d),
        Models.TriangleEdgeBudget))
  /** Hub-capped LOCAL CLUSTERING on the RAW co-purchase graph —
    * coefficients exact over the kept subgraph against the KEPT
    * degree, hubs NULL-flagged (projection over the registered capped
    * triangle machinery; VERDICT r16 #5). */
  def copurchaseClusteringCapped(s: SparkSession, d: String): DataFrame =
    operators.Graph.clusteringFromCappedCounts(
      copurchaseTrianglesCapped(s, d))
  /** DOULION-estimated LOCAL CLUSTERING on the RAW co-purchase graph —
    * budget-bounded sampled triangle estimates over exact full-graph
    * degrees; the raw-graph scale path for the coefficient the exact
    * operator only serves on the strong graph. */
  def copurchaseClusteringApprox(s: SparkSession, d: String): DataFrame =
    operators.Graph.clusteringFromSampledCounts(copurchaseEdges(s, d),
      copurchaseTrianglesApprox(s, d))
  /** ERROR HARNESS pricing the DOULION estimator against exact
    * triangle counts on the graph where both can run (the strong
    * graph) — the closeness_approx_error convention: every
    * approximate path ships with a measured-quality gate. The global
    * totals compare Σ per-node counts (= 3·T, exact integers on both
    * sides before ONE scaling expression), so no engine-ordered double
    * sum exists anywhere; err_ppm uses the shared explicit floor. */
  def trianglesApproxError(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val den3 = Models.TriangleSampleDen * Models.TriangleSampleDen *
      Models.TriangleSampleDen
    val num3 = Models.TriangleSampleNum * Models.TriangleSampleNum *
      Models.TriangleSampleNum
    val ex = copurchaseTriangles(s, d)
      .agg(count(lit(1)).as("n_nodes_exact"),
        coalesce(sum(col("n_triangles")), lit(0L)).as("tri3_exact"))
    val sm = operators.Graph.triangleCountsSampled(
        copurchaseStrongEdges(s, d).select("src", "dst"),
        Models.TriangleSampleNum, Models.TriangleSampleDen)
      .agg(count(lit(1)).as("n_nodes_sampled"),
        coalesce(sum(col("n_triangles_sampled")), lit(0L))
          .as("tri3_sampled"))
    ex.crossJoin(broadcast(sm))
      .withColumn("tri3_est",
        (col("tri3_sampled") * lit(den3)).cast("double")
          / lit(num3.toDouble))
      .select(col("n_nodes_exact"), col("n_nodes_sampled"),
        col("tri3_exact"), col("tri3_sampled"), col("tri3_est"),
        when(col("tri3_exact") > 0,
          floor(abs(col("tri3_est") - col("tri3_exact").cast("double"))
            / col("tri3_exact").cast("double")
            * Models.ErrPpmScale.toDouble).cast("long"))
          .as("err_ppm"))
  }
  /** Common-neighbor / Jaccard link predictions on the strong-edge
    * affinity graph — top-K candidate pairs the graph does NOT
    * already contain (the "also bought" recommender). */
  def copurchaseLinkPredictions(s: SparkSession, d: String): DataFrame =
    operators.Graph.linkPredictions(
      copurchaseStrongEdges(s, d).select("src", "dst"), Models.LinkPredTopK)

  /** Hard round cap of the HyperBall FIXPOINT run — 2.6× the measured
    * raw-graph diameter (3 at both test scales); a graph that outruns
    * it reports converged = false instead of a silently truncated
    * distance curve. Shared with the oracle's unrolled mirror. */
  val HyperBallHardCap = 8

  /** HyperBall register relaxation run TO FIXPOINT on the RAW
    * co-purchase graph — Mat'd iterative build (the PageRank
    * convention). One sketch build serves BOTH the bounded-radius
    * centrality view ([[copurchaseHyperBall]] pads it to BfsMaxHops)
    * and the HyperANF distance-distribution query: O(|V|·m) register
    * state regardless of density, the path that SURVIVES the dense
    * giant component where [[copurchaseCloseness]]'s exact all-pairs
    * state measured ~|V|² (the r14 probe OOM). */
  private def copurchaseHyperBallFix(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "copurchase_hyperball_fix")(
      operators.Graph.hyperBallToFixpoint(copurchaseEdges(s, d),
        Models.HyperBallHardCap))

  /** The BfsMaxHops-radius HyperBall view the centrality pivot reads —
    * a PROJECTION of the fixpoint table, not a second relaxation:
    * registers are stable past the fixpoint, so hops beyond it carry
    * the fixpoint estimates verbatim (bit-identical to running the
    * fixed-cap relaxation, which the oracle's 4-round mirror still
    * gates). */
  private def copurchaseHyperBall(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val f = copurchaseHyperBallFix(s, d)
      .select("node", "hop", "hll_estimate")
    val mh = f.agg(max(col("hop")).as("__mh"))
    val pad = f.crossJoin(broadcast(mh))
      .filter(col("hop") === col("__mh") && col("__mh") < Models.BfsMaxHops)
      .select(col("node"),
        explode(sequence(col("__mh") + 1, lit(Models.BfsMaxHops))).as("hop"),
        col("hll_estimate"))
    f.filter(col("hop") <= Models.BfsMaxHops).unionByName(pad)
  }
  /** Same build on the weight-THRESHOLDED strong graph — feeds the
    * approx-vs-exact error harness ([[closenessApproxError]]). */
  private def copurchaseHyperBallStrong(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "copurchase_hyperball_strong")(
      operators.Graph.hyperBall(
        copurchaseStrongEdges(s, d).select("src", "dst"), Models.BfsMaxHops))

  /** Pivot a HyperBall (node, hop, hll_estimate) table into per-node
    * ball estimates and the derived APPROXIMATE closeness/harmonic:
    * successive ball differences estimate the per-distance
    * neighborhood counts (clamped at 0 — a linear-counting branch
    * switch can dip an estimate), then the same reach/Σdist and
    * Σ dᵢ/i shapes as the exact operator, every double expression a
    * FIXED operation tree mirrored verbatim by the oracle (no
    * engine-ordered double sums anywhere). */
  private def hyperBallCentrality(hb: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    require(Models.BfsMaxHops == 4, "centrality pivot specialized to 4 hops")
    def estAt(t: Int) =
      max(when(col("hop") === t, col("hll_estimate"))).as(s"est_h$t")
    hb.groupBy("node").agg(estAt(0), estAt(1), estAt(2), estAt(3), estAt(4))
      .withColumn("d1_est", greatest(col("est_h1") - col("est_h0"), lit(0.0)))
      .withColumn("d2_est", greatest(col("est_h2") - col("est_h1"), lit(0.0)))
      .withColumn("d3_est", greatest(col("est_h3") - col("est_h2"), lit(0.0)))
      .withColumn("d4_est", greatest(col("est_h4") - col("est_h3"), lit(0.0)))
      .withColumn("reach_approx",
        col("d1_est") + col("d2_est") + col("d3_est") + col("d4_est"))
      .withColumn("dist_sum_approx",
        col("d1_est") + lit(2.0) * col("d2_est") + lit(3.0) * col("d3_est")
          + lit(4.0) * col("d4_est"))
      .withColumn("closeness_approx",
        when(col("dist_sum_approx") > 0.0,
          col("reach_approx") / col("dist_sum_approx")))
      .withColumn("harmonic_approx",
        col("d1_est") + col("d2_est") / 2.0 + col("d3_est") / 3.0
          + col("d4_est") / 4.0)
  }

  /** APPROXIMATE closeness/harmonic centrality on the RAW co-purchase
    * graph via HyperBall (Boldi & Vigna 2013) — the query the exact
    * operator measurably CANNOT serve there (r14 SCALE_LOCAL: the
    * all-pairs frontier OOM'd at 1×). State O(|V|·m) regardless of
    * density; gated bit-for-bit by a full DuckDB mirror of the
    * register relaxation (the deterministic md5-60 HLL makes the
    * sketch itself differential-testable, not just sanity-checked). */
  def copurchaseClosenessApprox(s: SparkSession, d: String): DataFrame =
    hyperBallCentrality(copurchaseHyperBall(s, d))

  /** Scale of the per-node error integers (ppm). */
  val ErrPpmScale = 1000000L

  /** ERROR HARNESS pricing the HyperBall approximation against the
    * exact operator on the graph where both can run (the strong
    * graph) — the `ann_recall`/`lsh_recall` convention: every
    * approximate path ships with a measured-quality gate. Per node,
    * |approx − exact|/exact in exact ppm integers (floor — Spark's
    * double→long cast truncates but DuckDB's rounds, so the floor is
    * explicit and shared); the summary is integer sums/maxes (order-
    * free) plus one final division per mean. */
  def closenessApproxError(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val approx = hyperBallCentrality(copurchaseHyperBallStrong(s, d))
      .select(col("node"), col("reach_approx"), col("harmonic_approx"))
    val exact = copurchaseCloseness(s, d)
      .select(col("node"), col("reach_n"), col("harmonic"))
    exact.join(approx, Seq("node"))
      .select(col("node"),
        floor(abs(col("reach_approx") - col("reach_n").cast("double"))
          / col("reach_n").cast("double") * ErrPpmScale.toDouble)
          .cast("long").as("reach_err_ppm"),
        floor(abs(col("harmonic_approx") - col("harmonic"))
          / col("harmonic") * ErrPpmScale.toDouble)
          .cast("long").as("harmonic_err_ppm"))
      .agg(
        count(lit(1)).as("n_nodes"),
        sum(col("reach_err_ppm")).as("reach_err_ppm_sum"),
        max(col("reach_err_ppm")).as("reach_err_ppm_max"),
        sum(col("harmonic_err_ppm")).as("harmonic_err_ppm_sum"),
        max(col("harmonic_err_ppm")).as("harmonic_err_ppm_max"))
      .select(col("n_nodes"),
        col("reach_err_ppm_sum"), col("reach_err_ppm_max"),
        (col("reach_err_ppm_sum").cast("double")
          / col("n_nodes").cast("double")).as("reach_err_ppm_mean"),
        col("harmonic_err_ppm_sum"), col("harmonic_err_ppm_max"),
        (col("harmonic_err_ppm_sum").cast("double")
          / col("n_nodes").cast("double")).as("harmonic_err_ppm_mean"))
  }

  /** Micro-unit quantizer of the distance-distribution masses: ball
    * estimates floor-quantize (half-up) to exact int64 BEFORE the
    * cross-node sum, so no engine-ordered double sum exists anywhere
    * in the curve. Headroom: |V|·est·1e6 ≤ ~4e14 at probe scale;
    * int64 bounds |V|²·1e6, i.e. ~3e6 nodes — past that drop the
    * quant to 1e3 (documented, not silently wrong: ANSI-off Spark
    * would wrap where DuckDB's hugeint errors loudly). */
  val MassQuant = 1000000.0

  /** HYPERANF OUTPUTS (Boldi, Rosa & Vigna 2011) from the fixpoint
    * HyperBall table — the graph-shape survey a crawl pipeline reads
    * before anything else: per hop t the total reachable-pair mass
    * N(t) = Σ_v |B(v,t)|, the per-distance deltas, the cumulative
    * fraction, and (constant on every row, the summary-broadcast
    * shape) the measured fixpoint depth, the honest converged flag,
    * the INTERPOLATED effective diameter (smallest t where N(t) ≥
    * 0.9·N(∞), linear between hops — the HyperANF convention) and the
    * average distance Σ t·ΔN(t) / (N(∞) − N(0)).
    *
    * Determinism: masses are exact int64 micro-unit sums (one
    * explicit half-up floor per node-hop); the 0.9 threshold hop is
    * an EXACT integer comparison (10·N(t) ≥ 9·N(∞)); doubles appear
    * only in the fixed interpolation/ratio trees at the boundary.
    * Scale: everything after the (already Mat'd) sketch table is one
    * |V|·hops → hops aggregation; every window runs on the ≤ hardCap
    * hop dimension — bounded, the W3 exception. */
  def copurchaseDistanceDistribution(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val w = operators.BoundedWindow.orderBy(col("hop"))
    val byHop = copurchaseHyperBallFix(s, d)
      .groupBy("hop")
      .agg(count(lit(1)).as("n_nodes"),
        sum(floor(col("hll_estimate") * lit(MassQuant) + lit(0.5))
          .cast("long")).as("mass_q6"),
        max(col("converged")).as("__conv"))
      .withColumn("prev_q6", lag(col("mass_q6"), 1).over(w))
      .withColumn("delta_q6",
        when(col("hop") >= 1, col("mass_q6") - col("prev_q6")))
    val totals = byHop.agg(
      max(col("hop")).as("n_hops_converged"),
      max(col("__conv")).as("converged"),
      // masses are monotone in hop, so max = the fixpoint mass N(inf)
      max(col("mass_q6")).as("mt_q6"),
      max(when(col("hop") === 0, col("mass_q6"))).as("m0_q6"),
      coalesce(sum(col("hop") * col("delta_q6")), lit(0L)).as("wsum_q6"))
    val t90 = byHop.crossJoin(broadcast(totals))
      .filter(col("mass_q6") * 10 >= col("mt_q6") * 9)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("hop").as("t90"), col("mass_q6").as("t90_q6"),
        col("prev_q6").as("t90_prev_q6"))
    val summary = totals.crossJoin(broadcast(t90))
      .select(col("n_hops_converged"), col("converged"),
        when(col("t90") === 0, lit(0.0))
          .otherwise((col("t90") - 1).cast("double")
            + (lit(0.9) * col("mt_q6").cast("double")
              - col("t90_prev_q6").cast("double"))
            / (col("t90_q6").cast("double")
              - col("t90_prev_q6").cast("double")))
          .as("effective_diameter_90"),
        when(col("mt_q6") > col("m0_q6"),
          col("wsum_q6").cast("double")
            / (col("mt_q6") - col("m0_q6")).cast("double"))
          .as("avg_distance"),
        col("mt_q6"))
    byHop.crossJoin(broadcast(summary))
      .select(col("hop"), col("n_nodes"), col("mass_q6"),
        (col("mass_q6").cast("double") / lit(MassQuant)).as("ball_mass"),
        col("delta_q6"),
        (col("mass_q6").cast("double") / col("mt_q6").cast("double"))
          .as("cum_fraction"),
        col("n_hops_converged"), col("converged"),
        col("effective_diameter_90"), col("avg_distance"))
  }

  /** Exact column profile of the orders mart (catalog/dq audit). */
  def ordersProfile(s: SparkSession, d: String): DataFrame =
    operators.Profile.profile(orders(s, d), Models.OrdersProfileCols)
  /** CORPUS-grain profile of the documents table — the HLL-swap
    * variant: distinct counts are sketch estimates, no Expand, the
    * shuffle carries registers instead of values. */
  def documentsProfile(s: SparkSession, d: String): DataFrame =
    operators.Profile.profileApprox(
      Tables.documents(s, d), Models.DocumentsProfileCols)
  /** JSONL write→read roundtrip + corrupt-shard quarantine, gated by
    * a parquet-side checksum oracle ([[sources.Corpus.roundtripAudit]]). */
  def jsonlIngestAudit(s: SparkSession, d: String): DataFrame = {
    val scratch = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-jsonl",
      s.sparkContext.applicationId,
      d.replaceAll("[^A-Za-z0-9]", "_"))
    sources.Corpus.roundtripAudit(s, Tables.documents(s, d), scratch.toString)
  }
  /** BFS hop distances from the smallest connected product id —
    * deterministic (integer-min relaxation; the source definition is
    * mirrored in the oracle). Mat'd: the iterative rounds run ONCE
    * per session at index-build time (the sq8_corpus precedent) and
    * the registered query scans the materialized distance table; the
    * per-round checkpoints go unreachable after the write and fall to
    * the ContextCleaner. */
  def productCopurchaseDistances(s: SparkSession, d: String): DataFrame =
    Mat.table(s, d, "copurchase_distances") {
      import org.apache.spark.sql.functions.{col, min}
      val edges = copurchaseEdges(s, d)
      val src = edges.agg(min(col("src")).as("node"))
      operators.Graph.bfsDistances(edges, src, Models.BfsMaxHops)
    }
  def weightedSample(s: SparkSession, d: String): DataFrame =
    llm.Splits.weightedSample(Tables.documents(s, d))
  def packSequences(s: SparkSession, d: String): DataFrame =
    llm.Packing.packSequences(Tables.documents(s, d))
  /** Padded-batch construction: power-of-two length buckets, longest-
    * first batches of 16, per-batch padding efficiency. */
  def lengthBucketedBatches(s: SparkSession, d: String): DataFrame =
    llm.Packing.lengthBucketedBatches(Tables.documents(s, d))
  /** The end-to-end training-corpus build: curation-kept ∩ train-split
    * documents, sequence-packed into token budgets — each stage is the
    * SAME (Mat-shared) component its standalone query gates. */
  def trainingCorpus(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val kept = corpusCuration(s, d)
      .filter(col("status") === "kept").select("doc_id")
    val train = datasetSplits(s, d)
      .filter(col("split") === "train").select("doc_id")
    val base = Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .join(kept, Seq("doc_id")).join(train, Seq("doc_id"))
    llm.Packing.packSequences(base)
  }
  /** Per-shard manifest of the packed training corpus (deterministic
    * salted-hash shard assignment of sequences). */
  def trainingShards(s: SparkSession, d: String): DataFrame =
    llm.Packing.shardStats(trainingCorpus(s, d))
  /** One BPE training per (session, dataset): Bpe.train eagerly
    * checkpoints each round, so the cached tuple holds materialized
    * plans both Mat builds below reuse — the K-round pipeline runs
    * once even though it feeds two tables. */
  private val bpeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      (DataFrame, DataFrame, Seq[DataFrame])]()
  private val bpeServed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String, String)]()
  private def bpeTrained(s: SparkSession, d: String)
      : (DataFrame, DataFrame, Seq[DataFrame]) =
    bpeCache.computeIfAbsent((s.sparkContext.applicationId, d),
      _ => llm.Bpe.trainRetained(Tables.documents(s, d)))
  /** The unigram freeing discipline applied to BPE (same ADVICE r15
    * shape): once both Mat tables are served, the retained training
    * checkpoints are dead weight — measured to matter in the scale
    * probe, whose fresh-alias passes otherwise accumulate one
    * retained word-table block set per alias until the heap dies. */
  private def bpeFreeIfServed(s: SparkSession, d: String,
                              which: String): Unit = {
    val app = s.sparkContext.applicationId
    bpeServed.add((app, d, which)): Unit
    if (bpeServed.contains((app, d, "merges")) &&
        bpeServed.contains((app, d, "seg")))
      Option(bpeCache.remove((app, d)))
        .foreach(_._3.foreach(graft.plans.Checkpoints.free))
  }
  /** Learned BPE merge table (the trained tokenizer vocabulary) —
    * distinct-word-frequency-bounded, so training cost is vocabulary-
    * sized after the first corpus pass (llm.Bpe). */
  def bpeMerges(s: SparkSession, d: String): DataFrame = {
    val out = Mat.table(s, d, "bpe_merges")(bpeTrained(s, d)._1)
    bpeFreeIfServed(s, d, "merges")
    out
  }
  /** Every distinct corpus word segmented under the final merge table. */
  def bpeSegmentation(s: SparkSession, d: String): DataFrame = {
    val out = Mat.table(s, d, "bpe_segmentation")(bpeTrained(s, d)._2)
    bpeFreeIfServed(s, d, "seg")
    out
  }
  /** The tokenizer APPLIED: per-doc true BPE token counts through the
    * Mat'd (broadcastable) segmentation table. */
  def bpeTokenCounts(s: SparkSession, d: String): DataFrame =
    llm.Bpe.tokenCounts(Tables.documents(s, d), bpeSegmentation(s, d))
  /** The id-assigned piece vocabulary (serializer lookup table). */
  def bpeVocabIds(s: SparkSession, d: String): DataFrame =
    llm.Bpe.vocabIds(bpeSegmentation(s, d))
  /** Tokenizer fertility (BPE pieces per word) by language. */
  def bpeFertility(s: SparkSession, d: String): DataFrame =
    llm.Bpe.fertilityByLang(Tables.documents(s, d), bpeTokenCounts(s, d))
  private val unigramCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      (DataFrame, DataFrame, Seq[DataFrame])]()
  private val unigramServed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String, String)]()
  /** Unigram-LM tokenizer training (EM + prune), memoized per run —
    * the vocab and segmentation queries share one training pass. */
  private def unigramTrained(s: SparkSession, d: String)
      : (DataFrame, DataFrame, Seq[DataFrame]) =
    unigramCache.computeIfAbsent((s.sparkContext.applicationId, d),
      _ => llm.Unigram.trainRetained(Tables.documents(s, d)))
  /** Once BOTH Mat tables have materialized, the training pass's
    * retained checkpoints (words, seed, final EM model) are dead
    * weight — free their blocks and evict the cache entry so a
    * long-lived app iterating many data dirs doesn't accumulate
    * checkpoint storage per dir (ADVICE r15). The Mat tables serve
    * every later read; re-entry after eviction never retrains because
    * Mat.table's build thunk is by-name. */
  private def unigramFreeIfServed(s: SparkSession, d: String,
                                  which: String): Unit = {
    val app = s.sparkContext.applicationId
    unigramServed.add((app, d, which)): Unit
    if (unigramServed.contains((app, d, "vocab")) &&
        unigramServed.contains((app, d, "seg")))
      Option(unigramCache.remove((app, d)))
        .foreach(_._3.foreach(graft.plans.Checkpoints.free))
  }
  /** The pruned unigram vocabulary with quantized-nanonat costs. */
  def unigramVocab(s: SparkSession, d: String): DataFrame = {
    val out = Mat.table(s, d, "unigram_vocab")(unigramTrained(s, d)._1)
    unigramFreeIfServed(s, d, "vocab")
    out
  }
  /** Every distinct word under the final unigram Viterbi model. */
  def unigramSegmentation(s: SparkSession, d: String): DataFrame = {
    val out = Mat.table(s, d, "unigram_segmentation")(unigramTrained(s, d)._2)
    unigramFreeIfServed(s, d, "seg")
    out
  }
  /** BPE-vs-unigram fertility shoot-out (pieces per word instance). */
  def tokenizerFertilityCompare(s: SparkSession, d: String): DataFrame =
    llm.Unigram.fertilityCompare(bpeSegmentation(s, d),
      unigramSegmentation(s, d))
  /** Incremental dedup demo: docs with doc_id % 5 == 0 play the "new
    * ingest batch" — their signatures are aggregated fresh from the
    * shingle barrier (production ingest computes the batch's shingles
    * once; nothing text-level runs twice), the rest come from the
    * materialized signature barrier, never re-hashed. */
  /** The stored LSH band index of the EXISTING corpus (doc_id % 5 != 0
    * — the demo's standing/new split): Mat'd like the other index
    * barriers, so the per-batch incremental run reads the band table a
    * production pipeline maintains instead of re-deriving corpus band
    * keys per execution. */
  private def minhashBandsExisting(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    Mat.table(s, d, "minhash_bands_existing")(
      llm.Dedup.bandTable(
        minhashSignatures(s, d).filter(col("doc_id") % 5 =!= 0)))
  }
  def dedupIncrementalPairs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val newSigs = llm.Dedup.minhashSignatures(
      docShingles(s, d).filter(col("doc_id") % 5 === 0))
    llm.Dedup.incrementalMinhashPairsFromBands(
      minhashBandsExisting(s, d), newSigs)
  }
  /** Streaming twin of [[dedupIncrementalPairs]]: the same new-batch
    * vs stored-band-index maintenance, run through readStream →
    * foreachBatch → parquet sink (same oracle). */
  def streamNeardupPairs(s: SparkSession, d: String): DataFrame =
    streaming.Streams.incrementalDedupStreamOnce(s, d, minhashBandsExisting(s, d))
  /** TWO-micro-batch variant: cross-batch self-append semantics under
    * the same DuckDB oracle (the sink only matches if a batch-2 doc
    * finds its batch-1 near-dups through the self-appended index). */
  def streamNeardupMultibatch(s: SparkSession, d: String): DataFrame =
    streaming.Streams.incrementalDedupMultiBatchOnce(s, d, minhashBandsExisting(s, d))
  def skewSaltedEnrich(s: SparkSession, d: String): DataFrame =
    marts.EventMarts.skewSaltedEnrich(Tables.events(s, d))
  /** Sequential-pattern support over user journeys (length-2/3
    * ordered event-type subsequences, greedy-earliest existence). */
  def eventSeqSupport(s: SparkSession, d: String): DataFrame =
    marts.EventMarts.eventSeqSupport(Tables.events(s, d))
  /** First-order Markov transition matrix + k-step distribution over
    * event-type journeys. */
  def eventMarkov(s: SparkSession, d: String): DataFrame =
    marts.EventMarts.eventMarkov(Tables.events(s, d))
  /** Blocked edit-distance nearest-name match over the product catalog
    * (entity resolution; blocked semantics mirrored by the oracle). */
  def fuzzyNameMatch(s: SparkSession, d: String): DataFrame =
    operators.Fuzzy.nearestNameMatch(stgProducts(s, d), "product_name")
  /** Transitive entity resolution: fuzzy-match edges closed into
    * catalog entity groups through the SAME connected-components
    * operator as the dedup families (labels propagate the
    * lexicographic-minimum name = the canonical form). */
  def nameMatchClusters(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    // Mat'd like dedup_clusters: the 8 eagerly-checkpointed propagation
    // rounds are all fixed per-round job cost (4.2 s warm un-Mat'd in
    // the r6 bench) — behind the barrier they run once per session.
    Mat.table(s, d, "name_match_clusters")(
      llm.Clusters.connectedComponents(
          operators.Fuzzy.similarPairs(stgProducts(s, d), "product_name"))
        .select(col("doc_id").as("name"), col("cluster_id"), col("cluster_size")))
  }
  /** Bigram-LM surprisal quality score (conditional twin of
    * [[docSurprisal]]). */
  def bigramSurprisal(s: SparkSession, d: String): DataFrame =
    llm.Relevance.bigramSurprisal(Tables.documents(s, d))
  /** Per-doc OOV rate against the corpus top-K vocabulary. */
  def vocabCoverage(s: SparkSession, d: String): DataFrame =
    llm.TextStats.vocabCoverage(Tables.documents(s, d))
  /** The reference's declarative test suite as one audit table —
    * every rule over the DECIMAL model surface (exact invariants). */
  def dqSummary(s: SparkSession, d: String): DataFrame =
    testing.DqSummary.summary {
      case "stg_customers" => stgCustomers(s, d)
      case "stg_orders" => stgOrders(s, d)
      case "stg_order_items" => stgOrderItems(s, d)
      case "stg_products" => stgProducts(s, d)
      case "stg_locations" => stgLocations(s, d)
      case "stg_supplies" => stgSupplies(s, d)
      case "orders" => orders(s, d)
      case "customers" => customers(s, d)
      case "order_items" => orderItems(s, d)
      case "products" => products(s, d)
      case "locations" => locations(s, d)
      case "supplies" => supplies(s, d)
      case "customer_segmentation" => customerSegmentation(s, d)
      case "time_analytics" => timeAnalytics(s, d)
      case other => sys.error(s"dq_summary: unknown table $other")
    }
  def eventPropsStats(s: SparkSession, d: String): DataFrame =
    marts.EventMarts.eventPropsStats(Tables.events(s, d))
  def sessionWindowAgg(s: SparkSession, d: String): DataFrame =
    marts.EventMarts.sessionWindowAgg(Tables.events(s, d))

  // ---- semantic layer (M1-M8): saved queries over the marts ----

  private val semanticBacking: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orders" -> (orders _),
    "order_items" -> (orderItems _),
    "customers" -> (customers _),
    "products" -> (products _),
    "locations" -> (locations _),
    "supplies" -> (supplies _),
    "customer_segmentation" -> (customerSegmentation _),
    "time_analytics" -> (timeAnalytics _))

  def semanticQuery(name: String)(s: SparkSession, d: String): DataFrame = {
    val q = semantic.Registry.savedQuery(name)
    // the resolver lets entity-join group-bys pull the dim model's
    // mart (Mat-barriered, so a shared model builds once)
    semantic.Planner.savedQuery(q, semantic.Registry,
      semanticBacking(q.model)(s, d), m => semanticBacking(m)(s, d))
  }

  /** Multi-model metric query: each part aggregates its own fact with
    * the single-scan plan; the per-group frames full-outer-join on the
    * shared key (semantic/Planner.multiQuery). */
  def semanticMultiQuery(name: String)(s: SparkSession, d: String): DataFrame =
    semantic.Planner.multiQuery(semantic.Registry.multiQuery(name),
      semantic.Registry, m => semanticBacking(m)(s, d))

  /** S2+F1 oracle round trip (VERDICT r17 #4): dump a customer slice
    * to header CSV with the money column in CENTS, reload it through
    * the explicit-schema seed loader (sources/Seeds — dbt's seed
    * ingestion, reference dbt_project.yml:25-29), and apply the
    * cents_to_dollars macro (reference macros/cents_to_dollars.sql:7-9).
    * The CSV lands under target/ at a FIXED path so the DuckDB oracle
    * can read the same bytes with read_csv — closing the last two
    * spec-only §2 operators with a real differential gate. Cents are
    * integers (round(acctbal*100)), so /100 is within 1e-12 of an
    * exact 2-decimal value on both engines and the decimal(16,2) cast
    * cannot straddle a rounding boundary. */
  def seedCsvRoundtrip(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = sources.Seeds.RoundtripDir
    Tables.customer(s, d).select(
      col("c_custkey").as("id"),
      col("c_name").as("name"),
      col("c_nationkey").as("nation_id"),
      // cents as a whole-number double — the seed schema's money type
      round(col("c_acctbal") * 100, 0).as("balance"),
      col("c_mktsegment").as("segment"))
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(dir)
    sources.Seeds.load(s, dir, "raw_customers")
      .select(col("id"), col("name"), col("nation_id"),
        functions.Funcs.centsToDollars(col("balance")).as("balance_dollars"),
        col("segment"))
  }

  /** Build every Mat-materialized mart, independent subtrees in
    * parallel (dbt's thread-pool DAG execution, SURVEY §3.1 step 4):
    * the roots below cover the whole barrier DAG — shared parents
    * (order_items → orders) are built once via Mat's per-key futures
    * while disjoint subtrees (segmentation vs supplies vs shingles)
    * overlap. Used by the Bench warm-up (so per-query timings measure
    * marginal plan cost, not first-consumer mart builds) and by Verify.
    */
  def prebuildMarts(s: SparkSession, d: String): Seq[String] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = Mat.ec
    val roots: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "customers" -> (customers _), "products" -> (products _),
      "locations" -> (locations _), "supplies" -> (supplies _),
      "time_analytics" -> (timeAnalytics _),
      "customer_segmentation" -> (customerSegmentation _),
      "minhash_sigs" -> (minhashSignatures _),
      "simhash_sigs" -> (simhashSignatures _),
      "doc_shingle_keys" -> (docShingleKeys _),
      "text_stats" -> (textStats _),
      "dedup_clusters" -> (dedupClusters _),
      "kmeans_centroids" -> (kmeansCentroids _),
      "pq_codebooks" -> (pqCodebooks _),
      // transitively builds the pq_codebooks barrier first
      "pq_reconstructed" -> (pqReconstructed _),
      // transitively builds kmeans_centroids + rpq_codebooks first
      "rpq_reconstructed" -> (rpqReconstructed _),
      "embedding_dedup_clusters" -> (embeddingDedupClusters _),
      "substring_dedup" -> (substringDedup _),
      "bpe_merges" -> (bpeMerges _),
      "bpe_segmentation" -> (bpeSegmentation _),
      "doc_surprisal" -> (docSurprisal _),
      "bigram_surprisal" -> (bigramSurprisalMat _),
      "ngram_jaccard_pairs" -> (ngramJaccardPairs _),
      "name_match_clusters" -> (nameMatchClusters _),
      "hll_day_registers" -> (hllDayRegisters _),
      "sq8_corpus" -> (sq8Corpus _),
      "event_purchasers" -> (eventPurchasers _),
      "ann_exact_topk" -> (annExactTopK _),
      "ivf_label_centroids" -> (ivfLabelCentroids _),
      // transitively builds the copurchase_edges barrier first
      "copurchase_distances" -> (productCopurchaseDistances _),
      "copurchase_strong_edges" -> (copurchaseStrongEdges _),
      "copurchase_kcore" -> (copurchaseKcore _),
      "copurchase_pagerank" -> (copurchasePagerank _),
      "copurchase_pagerank_directed" -> (copurchasePagerankDirected _),
      "minhash_bands_existing" -> (minhashBandsExisting _),
      // transitively builds the doc_embeddings barrier first
      "quality_weights" -> (qualityWeights _),
      "tfidf_top_terms" -> (tfidfTopTerms _),
      // transitively builds hybrid_postings + hybrid_corpus_stats
      "hybrid_impact" -> (hybridImpact _),
      // transitively builds doc_embeddings → sem_vectors first
      "sem_band_index" -> (semBandIndex _),
      "sem_band_index_standing" -> (semBandIndexStanding _),
      // transitively builds hybrid_impact / sem_vectors / sem_band_index
      "hybrid_eval_indexed" -> (hybridEvalIndexed _),
      "hybrid_eval_exact" -> (hybridEvalExact _),
      "ngram_containment_pairs" -> (ngramContainmentPairs _),
      // transitively builds winnow_fps first
      "winnow_shared_docs" -> (winnowSharedDocs _),
      // transitively build the copurchase_edges barrier first
      "copurchase_triangles_capped" -> (copurchaseTrianglesCapped _),
      "copurchase_triangles_approx" -> (copurchaseTrianglesApprox _),
      "copurchase_communities" -> (copurchaseCommunities _),
      // r18: the remaining Mat barriers, previously built INLINE by
      // their first consumer's cold pass (the documented 10-25× cold
      // outliers — e.g. copurchase_closeness_approx paid its 45 s
      // HyperBall fixpoint build inside the first timed pass). Bench's
      // stated contract is that prebuild materializes EVERY Mat table
      // up front; these complete it. Roots only — parents build
      // transitively via the per-key futures.
      "revenue_theilsen" -> (revenueTheilSen _),       // + daily_summary, theilsen_line
      "simhash_pairs" -> (simhashPairs _),
      "ivf_kmeans_lists" -> (ivfKmeansLists _),
      "media_ahash" -> (mediaAHash _),
      "opq_reconstructed" -> (opqReconstructed _),     // + embedding_pca_topk, opq_corpus, opq_codebooks
      "embedding_pca" -> (embeddingPca _),
      "quality_predictions" -> (qualityPredictions _),
      "copurchase_hyperball_fix" -> (copurchaseHyperBallFix _),
      "copurchase_hyperball_strong" -> (copurchaseHyperBallStrong _),
      "copurchase_closeness" -> (copurchaseCloseness _),
      "copurchase_bottleneck" -> (copurchaseBottleneck _),
      "copurchase_ppr" -> (copurchasePpr _),
      "unigram_segmentation" -> (unigramSegmentation _), // + unigram_vocab
      "cdc_incremental_agg" -> (cdcIncrementalAgg _),  // + snapshots, customers_snap_agg
      // only the BARRIER parent of the IVM stream (the stream itself
      // is a per-pass one-shot, not prebuild's to run)
      "events_ivm_base" -> (eventsIvmBase _),
      "zorder_zonemaps" -> (zorderZonemaps _),
      "hilbert_zonemaps" -> (hilbertZonemaps _),
      "psi_pinned_stats" -> (psiPinnedStats _),
      "hist_pinned_stats" -> (histPinnedStats _))
    val futs = roots.map { case (n, f) => n -> Future(f(s, d)) }
    // failures are RETURNED, not just logged: Bench embeds them in its
    // JSON so a query timed against a missing mart barrier (and thus
    // paying the whole chain build inline) is visible to consumers
    // (ADVICE r3 #5).
    futs.flatMap { case (n, f) =>
      try { Await.result(f, Duration.Inf); None }
      catch { case e: Throwable =>
        System.err.println(s"[prebuild] mart build failed for $n: ${e.getMessage}")
        Some(n)
      }
    }
  }
}
