package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.oracle.{CurateSql, LlmSql, OpsSql, Sql, StatsSql}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every key in `queries` has a matching DuckDB oracle in `oracleSql`
  * (same column names — the driver sorts columns by name before hashing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Models.orders(spark, "/root/testdata/sf0.001")

  /** Wrap a model for the driver: decimals → double at the output
    * boundary only (see [[Out.presentDoubles]]; VERDICT r1 #1). */
  private def out(fn: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, d) => Out.presentDoubles(fn(s, d))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // staging layer (P1 projections, F1/F2/F8/F11/F12 scalar fns)
    "stg_customers" -> out(Models.stgCustomers),
    "stg_orders" -> out(Models.stgOrders),
    "stg_order_items" -> out(Models.stgOrderItems),
    "stg_products" -> out(Models.stgProducts),
    "stg_locations" -> out(Models.stgLocations),
    "stg_supplies" -> out(Models.stgSupplies),
    // core marts (J1-J5, A1-A3, W1, F6/F7)
    "order_items" -> out(Models.orderItems),
    "orders" -> out(Models.orders),
    "customers" -> out(Models.customers),
    // change data feed between two retained versions of a bucketed
    // snapshot mart (Delta table_changes shape; shuffle-free diff)
    "mart_cdc" -> out(Models.martChanges),
    // incremental view maintenance: v1's stored aggregate + the
    // Δ-sized feed == v2's aggregate, never a full re-aggregation
    "cdc_incremental_agg" -> out(Models.cdcIncrementalAgg),
    // SCD2 snapshot (dbt snapshot, check strategy) over the same
    // two customer states: carried/closed/opened version rows
    "customers_scd2" -> out(Models.customersScd2),
    // analytics marts (A12-A18, W2-W4, J8-J16)
    "products" -> out(Models.products),
    "locations" -> out(Models.locations),
    "supplies" -> out(Models.supplies),
    "supplier_rollup" -> out(Models.supplierRollup),
    // exact NTILE/percent_rank/cume_dist via the two-phase global rank
    "customer_value_deciles" -> out(Models.customerValueDeciles),
    // grouped top-k via the native bounded-heap aggregate
    "top_products_per_supplier" -> out(Models.topProductsPerSupplier),
    // time marts (S7, A6-A11, W5, J17, P5, F2-F5)
    "time_spine" -> out(Models.timeSpine),
    "daily_summary" -> out(Models.dailySummary),
    "weekly_summary" -> out(Models.weeklySummary),
    "monthly_summary" -> out(Models.monthlySummary),
    "cohort_retention" -> out(Models.cohortRetention),
    "seasonal_trends" -> out(Models.seasonalTrends),
    "growth_metrics" -> out(Models.growthMetrics),
    "revenue_rollup" -> out(Models.revenueRollup),
    "monthly_order_stats" -> out(Models.monthlyOrderStats),
    "quarterly_revenue_pivot" -> out(Models.quarterlyRevenuePivot),
    "revenue_cube" -> out(Models.revenueCube),
    // explicit GROUPING SETS (the general form rollup/cube specialize)
    "revenue_grouping_sets" -> out(Models.revenueGroupingSets),
    "daily_moving_stats" -> out(Models.dailyMovingStats),
    // wide->long melt of the daily mart (single-Expand unpivot)
    "daily_metrics_long" -> out(Models.dailyMetricsLong),
    // trailing-window 2-sigma anomaly flags (exact-moment baseline)
    "revenue_anomalies" -> out(Models.revenueAnomalies),
    // EWMA-baseline spikes: exact power-of-two-weighted integer cents
    "revenue_ewma_anomalies" -> out(Models.ewmaAnomalies),
    // two-sided CUSUM changepoint statistics (closed-form, exact ints)
    "revenue_cusum" -> out(Models.revenueCusum),
    // Theil-Sen median-of-slopes robust trend (29.3% breakdown point)
    "revenue_theilsen" -> out(Models.revenueTheilSen),
    // STL-style decomposition: Theil-Sen trend + centered dow seasonal
    // + remainder, with the Hyndman strength gates on every row
    "revenue_stl" -> out(Models.revenueStl),
    // Holt level+trend double-exponential forecaster (exact ints)
    "revenue_holt" -> out(Models.revenueHolt),
    // Holt-Winters weekly seasonal arm + the holdout eval that prices it
    "event_volume_hw" -> out(Models.eventVolumeHw),
    "forecast_eval" -> out(Models.forecastEval),
    // Mann-Kendall trend significance (tie-corrected, exact ints)
    "mann_kendall" -> out(Models.mannKendall),
    // Wald-Wolfowitz runs test around the exact lower median
    "revenue_runs_test" -> out(Models.revenueRunsTest),
    // ACF points at lags 1/7/28 (decimal-exact sufficient stats)
    "revenue_autocorr" -> out(Models.revenueAutocorr),
    // Gini coefficient via the rank formula (two-phase global rank)
    "revenue_gini" -> out(Models.revenueGini),
    // Lorenz curve at decile grain (cumulative revenue share)
    "lorenz_deciles" -> out(Models.lorenzDeciles),
    // Benford first-digit audit (exact string digit, per-digit chi2)
    "benford_digits" -> out(Models.benfordDigits),
    // one-row Benford verdict: ordered-fold chi2 + MAD vs chi2_0.05,8
    "benford_summary" -> out(Models.benfordSummary),
    // the same audit over the event value stream (floor-exact cents)
    "event_benford" -> out(Models.eventBenford),
    // exact two-sample Kolmogorov-Smirnov weekday-vs-weekend drift
    "ks_weekend_drift" -> out(Models.ksWeekendDrift),
    // Kaplan-Meier tenure survival (exact-integer sequential product)
    "customer_survival_km" -> out(Models.customerSurvivalKm),
    // market-basket association rules: support/confidence/lift
    "basket_rules" -> out(Models.basketRules),
    // quintile migration matrix across the timeline split
    "customer_migration" -> out(Models.customerMigration),
    // inter-purchase gap histogram (repurchase-cycle distribution)
    "order_gap_stats" -> out(Models.orderGapStats),
    // Pearson chi2 independence: segment x priority contingency
    "segment_priority_chi2" -> out(Models.segmentPriorityChi2),
    "segment_priority_verdict" -> out(Models.segmentPriorityVerdict),
    // grouped closed-form OLS trends (sufficient-statistics reduce)
    "product_trend_ols" -> out(Models.productTrendOls),
    // Jaro-Winkler near-dup product names (native expr, blocked join)
    "jw_name_pairs" -> out(Models.jwNamePairs),
    // blocking-recall gate: length band vs exact all-pairs JW truth
    "jw_recall" -> out(Models.jwRecall),
    // grouped lead/lag cross-correlation between event-type series
    "event_type_xcorr" -> out(Models.eventTypeXcorr),
    // LOCF gap-filling over the calendar spine (ignore-nulls window)
    "daily_gapfill" -> out(Models.dailyGapfill),
    "time_analytics" -> out(Models.timeAnalytics),
    // segmentation (A4-A5, J6-J7, P4, P6, F3)
    "customer_segmentation" -> out(Models.customerSegmentation),
    // LLM-pipeline operators (documents / embeddings)
    "dedup_exact" -> out(Models.dedupExact),
    // normalization-before-hash dedup (reformatted-copy catcher)
    "dedup_normalized" -> out(Models.dedupNormalized),
    "minhash_signatures" -> out(Models.minhashSignatures),
    "minhash_pairs" -> out(Models.minhashPairs),
    // character-level (Levenshtein <= T) verification over the banded
    // candidates: the typo/small-patch dedup family shingles miss
    "edit_distance_pairs" -> out(Models.editDistancePairs),
    "simhash_signatures" -> out(Models.simhashSignatures),
    "simhash_pairs" -> out(Models.simhashPairs),
    "ngram_jaccard_pairs" -> out(Models.ngramJaccardPairs),
    // asymmetric containment: sub-document duplication Jaccard hides
    "ngram_containment_pairs" -> out(Models.ngramContainmentPairs),
    // LSH banding quality vs the exact-Jaccard truth set
    "dedup_lsh_recall" -> out(Models.dedupLshRecall),
    // cross-doc shared n-gram fraction (boilerplate signal)
    "doc_shared_ngrams" -> out(Models.docSharedNgrams),
    // remove cross-doc duplicated spans, rebuild the document
    "substring_dedup" -> out(Models.substringDedup),
    "dedup_clusters" -> out(Models.dedupClusters),
    "ann_cosine_topk" -> out(Models.annCosineTopK),
    // MMR diversification between retrieval and serving (greedy, λ=1/2;
    // candidates from the kmeans-IVF index probe, never a corpus scan)
    "mmr_rerank" -> out(Models.mmrRerank),
    // recall of the index-fed MMR selection vs the exact-fed one
    "mmr_recall" -> out(Models.mmrRecall),
    // metadata-filtered vector search (filter BEFORE top-k)
    "ann_filtered_topk" -> out(Models.annFilteredTopK),
    "ann_lsh_buckets" -> out(Models.annLshBuckets),
    // contrastive hard-negative mining (top wrong-label cosines)
    "ann_hard_negatives" -> out(Models.annHardNegatives),
    // Matryoshka prefix-truncation recall ladder
    "ann_matryoshka_recall" -> out(Models.annMatryoshkaRecall),
    "embedding_dedup_pairs" -> out(Models.embeddingDedupPairs),
    "ann_ivf_topk" -> out(Models.annIvfTopK),
    "ann_ivf_kmeans_topk" -> out(Models.annIvfKmeansTopK),
    // cluster-quota diversity sample (semantic-coverage downsampling)
    "diversity_sample" -> out(Models.diversitySample),
    // SemDeDup: within-cluster semantic-duplicate pruning
    "semdedup_prune" -> out(Models.semdedupPrune),
    // int8 scalar quantization + search over the dequantized corpus
    "embedding_quantization" -> out(Models.embeddingQuantization),
    // exact-integer Pearson matrix over embedding dims (anisotropy)
    "embedding_corr" -> out(Models.embeddingCorr),
    // top PC via quantized power iteration (whitening/OPQ input)
    "embedding_pca" -> out(Models.embeddingPca),
    // top-16 PCA basis by deflation off the Mat'd moment matrix — the
    // rotation OPQ consumes (closes the embedding_corr/pca promise)
    "embedding_pca_topk" -> out(Models.embeddingPcaTopK),
    // OPQ: PCA-rotated corpus -> PQ at equal code budget; its recall
    // row vs raw PQ is the measured answer to "what does the rotation
    // buy on this corpus"
    "ann_opq_topk" -> out(Models.annOpqTopK),
    "ann_sq8_topk" -> out(Models.annSq8TopK),
    // recall@k of the kmeans-IVF index vs the exact brute force
    "ann_recall" -> out(Models.annRecall),
    // recall of EVERY approximate index vs exact, one table
    "ann_recall_by_method" -> out(Models.annRecallByMethod),
    // transitive clusters over the embedding near-dup pairs
    "embedding_dedup_clusters" -> out(Models.embeddingDedupClusters),
    // deterministic epoch shuffle via the two-phase global index
    "epoch_shuffle" -> out(Models.epochShuffle),
    // product quantization: per-subspace codebooks → codes → PQ ANN
    "pq_codes" -> out(Models.pqCodes),
    "ann_pq_topk" -> out(Models.annPqTopK),
    "ann_pq_adc_topk" -> out(Models.annPqAdcTopK),
    "ann_pq_rerank_topk" -> out(Models.annPqRerankTopK),
    "ann_ivfpq_topk" -> out(Models.annIvfPqTopK),
    "ann_ivfpq_residual_topk" -> out(Models.annIvfPqResidualTopK),
    "text_stats" -> out(Models.textStats),
    // Flesch reading-ease / FK grade from exact regex counts
    "doc_readability" -> out(Models.docReadability),
    // rendezvous-hash shard routing + the minimal-motion guarantee
    "shard_routing" -> out(Models.shardRouting),
    "shard_stability" -> out(Models.shardStability),
    "corpus_curation" -> out(Models.corpusCuration),
    // per-(source, status) curation rollup with in-source shares
    "curation_report" -> out(Models.curationReport),
    "media_features" -> out(Models.mediaFeatures),
    // perceptual-hash image dedup: real-decode aHash + Hamming pairs
    "media_ahash" -> out(Models.mediaAHash),
    "media_ahash_pairs" -> out(Models.mediaAHashPairs),
    "media_resized" -> out(Models.mediaResized),
    "media_frames" -> out(Models.mediaFrames),
    "dataset_splits" -> out(Models.datasetSplits),
    // sampling design: Neyman vs proportional allocation + design effect
    "neyman_allocation" -> out(Models.neymanAllocation),
    "kmeans_centroids" -> out(Models.kmeansCentroids),
    "bm25_scores" -> out(Models.bm25Scores),
    "sessionize" -> out(Models.sessionize),
    // custom relational operators: as-of join, bucketed range join,
    // deterministic HLL sketch
    "events_asof_purchase" -> out(Models.eventsAsofPurchase),
    "value_band_stats" -> out(Models.valueBandStats),
    "hll_user_counts" -> out(Models.hllUserCounts),
    // per-partition sketches merged register-wise (mergeability gate)
    "hll_merged_users" -> out(Models.hllMergedUsers),
    "hll_overlap_users" -> out(Models.hllOverlapUsers),
    // date-range distinct via the persisted daily sketch mart
    "hll_range_users" -> out(Models.hllRangeUsers),
    "value_percentiles" -> out(Models.valuePercentiles),
    "tfidf_top_terms" -> out(Models.tfidfTopTerms),
    // feature-hashed embeddings + hybrid BM25⊕cosine RRF retrieval
    "doc_embeddings" -> out(Models.hashedEmbeddings),
    "hybrid_search" -> out(Models.hybridSearch),
    // fused-RRF recall of the index-served plan vs the exact baseline
    "hybrid_recall" -> out(Models.hybridRecall),
    // pseudo-relevance-feedback query expansion over the impact index
    "prf_search" -> out(Models.prfSearch),
    // nDCG@5 + MRR of the index-served list vs the exact baseline
    "hybrid_rank_metrics" -> out(Models.hybridRankMetrics),
    // trained quality classifier: full-batch perceptron over hashed
    // features (weights broadcast out, integer gradients aggregated in)
    "quality_weights" -> out(Models.qualityWeights),
    "quality_predictions" -> out(Models.qualityPredictions),
    // quality-length Pareto frontier (skyline via bounded sort-sweep)
    "quality_pareto" -> out(Models.qualityPareto),
    // one-row model card: confusion counts + exact-rank-sum ROC-AUC
    "quality_eval" -> out(Models.qualityEval),
    // reliability table: margin deciles vs empirical positive rate
    "quality_calibration" -> out(Models.qualityCalibration),
    // split-conformal: calibrated coverage + prediction-set size
    "quality_conformal" -> out(Models.qualityConformal),
    // unigram LM surprisal quality score (quantized-ln determinism)
    "doc_surprisal" -> out(Models.docSurprisal),
    // held-out LM eval: train-split Laplace model scores validation
    "heldout_surprisal" -> out(Models.heldoutSurprisal),
    // difficulty quartile per doc (curriculum order, sketch thresholds)
    "curriculum_bins" -> out(Models.curriculumBins),
    "event_props_stats" -> out(Models.eventPropsStats),
    "session_window_agg" -> out(Models.sessionWindowAgg),
    // streaming surface: the windowed aggregation run through the real
    // streaming engine (file source → watermark → state store →
    // AvailableNow → memory sink), gated by its batch-twin oracle.
    "stream_windowed_counts" -> out(Models.streamWindowedCounts),
    // stateful streaming path: flatMapGroupsWithState session state,
    // gated by the batch-twin oracle minus never-closed last sessions.
    "stream_sessions" -> out(Models.streamSessions),
    // stream-static enrichment join path
    "stream_segment_counts" -> out(Models.streamSegmentCounts),
    // at-least-once ingest dedup (watermark-bounded key state)
    "stream_dedup" -> out(Models.streamDedup),
    // stream-stream interval join (click→purchase attribution)
    "stream_attribution" -> out(Models.streamAttribution),
    // LEFT OUTER stream-stream join (watermark-gated null padding)
    "stream_attribution_outer" -> out(Models.streamAttributionOuter),
    "stream_sink_parquet" -> out(Models.streamSinkParquet),
    "stream_sink_merge" -> out(Models.streamSinkMerge),
    // transformWithState (Spark 4 typed-state API): per-user rollup
    "stream_user_rollup" -> out(Models.streamUserRollup),
    // two-delivery time-split variants of the classic stateful
    // families: session continuation/closure across the trigger
    // boundary, watermark advance between batches, join state
    // surviving into batch 2, changelog upsert over a restored
    // counter — same batch-twin oracles, batches=2 in stream_progress
    "stream_sessions_multibatch" -> out(Models.streamSessionsMultibatch),
    "stream_segment_counts_multibatch" -> out(Models.streamSegmentCountsMultibatch),
    "stream_attribution_multibatch" -> out(Models.streamAttributionMultibatch),
    "stream_user_rollup_multibatch" -> out(Models.streamUserRollupMultibatch),
    // redelivery in a LATER batch: dedup key state across the boundary
    "stream_dedup_multibatch" -> out(Models.streamDedupMultibatch),
    // foreachBatch maintenance job: new-doc batches banded against the
    // stored LSH index (the streaming twin of dedup_incremental_pairs)
    "stream_neardup_pairs" -> out(Models.streamNeardupPairs),
    // the same loop over TWO mtime-ordered deliveries: cross-batch
    // pairs exist in the sink only via the self-appended index
    "stream_neardup_multibatch" -> out(Models.streamNeardupMultibatch),
    // serving indexes (postings/vectors/bands) maintained per batch
    // under a pinned quantizer, then hybrid-served from the parts
    "stream_hybrid_index" -> out(Models.streamHybridIndex),
    // streaming inference: new-doc batches scored per micro-batch
    // against the standing trained-weights mart
    "stream_quality_scores" -> out(Models.streamQualityScores),
    // streaming incremental view maintenance: a standing aggregate
    // maintained per micro-batch by the CDC delta rule; the oracle
    // re-aggregates from scratch (maintained == recomputed gate)
    "stream_ivm_agg" -> out(Models.streamIvmAgg),
    // streaming sketch maintenance: per-batch HLL registers merged
    // register-wise at read; oracle builds each day's sketch directly
    "stream_hll_users" -> out(Models.streamHllUsers),
    // streaming CMS: per-batch counters sum-merged at read; the batch
    // heavy-hitters oracle gates the identical result
    "stream_cms_heavy" -> out(Models.streamCmsHeavy),
    // streaming histogram-quantile maintenance (pinned bin edges,
    // counters merge by sum) — completes the mergeable-sketch family
    "stream_quantile_hist" -> out(Models.streamQuantileHist),
    // streaming PSI drift monitor (pinned reference quantizer,
    // ref/cur counters merge by sum) — the production monitor shape
    "stream_psi_monitor" -> out(Models.streamPsiMonitor),
    // streaming Benford audit: mergeable per-batch digit counters,
    // gated against the same oracle as the batch event audit
    "stream_benford_monitor" -> out(Models.streamBenfordMonitor),
    // deterministic stratified sampling + salted skew join
    "stratified_sample" -> out(Models.stratifiedEvents),
    "skew_salted_enrich" -> out(Models.skewSaltedEnrich),
    // round-6 curation surface: PII/blocklist scrubbing, benchmark
    // decontamination, intra-doc repetition, mixture rebalancing, and
    // a deterministic Count-Min heavy-hitter sketch
    "pii_redaction" -> out(Models.piiRedaction),
    "pii_redaction_shapes" -> out(Models.piiRedactionShapes),
    // k-anonymity go/no-go audit over the segmentation quasi-ids
    "k_anonymity_audit" -> out(Models.kAnonymityAudit),
    // right-to-be-forgotten scrub audit (deletion propagation + the
    // sketches-must-rebuild row)
    "forget_audit" -> out(Models.forgetAudit),
    // l-diversity: the homogeneity-attack companion audit
    "l_diversity_audit" -> out(Models.lDiversityAudit),
    // t-closeness: the skew-attack companion — release-audit trio
    "t_closeness_audit" -> out(Models.tClosenessAudit),
    "decontamination" -> out(Models.decontamination),
    "doc_repetition" -> out(Models.docRepetition),
    "domain_mixture" -> out(Models.domainMixture),
    // T=2 temperature mixture: targets ∝ sqrt(observed), exact-integer
    "mixture_temperature" -> out(Models.mixtureTemperature),
    // UniMax water-filled language budget (caps + water line, exact ints)
    "unimax_allocation" -> out(Models.unimaxAllocation),
    "doc_chunks" -> out(Models.docChunks),
    // paragraph-granularity boilerplate share (cross-doc chunk dupes)
    "chunk_boilerplate" -> out(Models.chunkBoilerplate),
    "cms_heavy_hitters" -> out(Models.cmsHeavyHitters),
    "hist_quantiles" -> out(Models.histQuantiles),
    "event_funnel" -> out(Models.eventFunnel),
    // sequential-pattern support (every length-2/3 journey pattern)
    "event_seq_support" -> out(Models.eventSeqSupport),
    // first-order Markov chain + k-step distribution over journeys
    "event_markov" -> out(Models.eventMarkov),
    // per-transition funnel latency percentiles
    "funnel_latency" -> out(Models.funnelLatency),
    // bounded-heap grouped top-k (native TypedImperativeAggregate)
    "top_docs_per_lang" -> out(Models.topDocsPerLang),
    // language-ID confusion matrix vs labels
    "lang_confusion" -> out(Models.langConfusion),
    // near-dup pairs straddling train/val/test boundaries
    "split_leakage_audit" -> out(Models.splitLeakage),
    // cross-source near-dup contamination matrix
    "source_dup_matrix" -> out(Models.sourceDupMatrix),
    // Bloom-pruned fact scan before an exact join (runtime-filter op)
    "bloom_pruned_stats" -> out(Models.bloomPrunedStats),
    // forward as-of join (next purchase at-or-after each event)
    "events_asof_next_purchase" -> out(Models.eventsAsofNextPurchase),
    // Z-order (Morton) layout keys for two-dimensional data skipping
    "zorder_keys" -> out(Models.zorderKeys),
    // per-file min/max stats of the zkey-sorted layout (data skipping)
    "zorder_zonemaps" -> out(Models.zorderZonemaps),
    // Hilbert curve layout (unit-step locality vs Morton's jumps)
    "hilbert_keys" -> out(Models.hilbertKeys),
    "hilbert_zonemaps" -> out(Models.hilbertZonemaps),
    // measured files-scanned shoot-out: Z-order vs Hilbert catalogs
    "layout_locality" -> out(Models.layoutLocality),
    // co-purchase graph: bounded-group edge derivation + k-round BFS
    "copurchase_edges" -> out(Models.productCopurchaseEdges),
    "copurchase_distances" -> out(Models.productCopurchaseDistances),
    "copurchase_triangles" -> out(Models.copurchaseTriangles),
    // RAW-graph triangle scale paths (exact counting is O(E^1.5) by
    // nature): hub-capped exact-over-kept-subgraph with truncation
    // accounting, budgeted DOULION edge-sampled estimates, and the
    // measured error gate vs the exact strong-graph counts
    "copurchase_triangles_capped" -> out(Models.copurchaseTrianglesCapped),
    "copurchase_triangles_approx" -> out(Models.copurchaseTrianglesApprox),
    "triangles_approx_error" -> out(Models.trianglesApproxError),
    "copurchase_clustering" -> out(Models.copurchaseClustering),
    // local clustering over the same raw-graph scale paths: exact over
    // the hub-capped kept subgraph / DOULION-estimated over exact degs
    "copurchase_clustering_capped" -> out(Models.copurchaseClusteringCapped),
    "copurchase_clustering_approx" -> out(Models.copurchaseClusteringApprox),
    // bounded-round k-core peel with a gated convergence flag
    "copurchase_kcore" -> out(Models.copurchaseKcore),
    // widest-path (max-min bottleneck) capacities from the hub product
    "copurchase_bottleneck" -> out(Models.copurchaseBottleneck),
    "copurchase_pagerank" -> out(Models.copurchasePagerank),
    // personalized PageRank from the modular seed set (RWR recommender)
    "copurchase_ppr" -> out(Models.copurchasePpr),
    "copurchase_pagerank_directed" -> out(Models.copurchasePagerankDirected),
    // synchronous label-propagation communities (strong-edge graph)
    "copurchase_communities" -> out(Models.copurchaseCommunities),
    // closeness + harmonic centrality (bounded-round all-pairs BFS)
    "copurchase_closeness" -> out(Models.copurchaseCloseness),
    // HyperBall approximate centrality on the RAW graph (the one the
    // exact all-pairs operator measurably OOMs on) + its error gate
    "copurchase_closeness_approx" -> out(Models.copurchaseClosenessApprox),
    "closeness_approx_error" -> out(Models.closenessApproxError),
    // HyperANF outputs from the run-to-fixpoint HyperBall: per-hop
    // reachable-mass curve, interpolated effective diameter (0.9),
    // average distance, honest converged flag
    "copurchase_distance_distribution" ->
      out(Models.copurchaseDistanceDistribution),
    // common-neighbor/Jaccard link prediction (non-adjacent top-K)
    "copurchase_link_predictions" -> out(Models.copurchaseLinkPredictions),
    // one-pass exact column profile (catalog/dq audit surface)
    "orders_profile" -> out(Models.ordersProfile),
    // exact-moment Pearson correlation matrix (order-independent)
    "order_correlations" -> out(Models.orderCorrelations),
    // one-row key-skew profile (the salt-or-broadcast pre-flight)
    "event_key_skew" -> out(Models.eventKeySkew),
    // PSI feature-drift monitor (ref month vs current month)
    "feature_drift_psi" -> out(Models.featureDriftPsi),
    "documents_profile" -> out(Models.documentsProfile),
    // JSONL roundtrip + quarantine, checksum-gated from the parquet side
    "jsonl_ingest_audit" -> out(Models.jsonlIngestAudit),
    // deterministic weighted sampling (Efraimidis–Spirakis via top_k)
    "weighted_sample" -> out(Models.weightedSample),
    // concatenate-and-chunk sequence packing into token budgets
    "pack_sequences" -> out(Models.packSequences),
    // padded-batch twin: length buckets → longest-first batches of 16
    "length_bucketed_batches" -> out(Models.lengthBucketedBatches),
    // per-ingest-batch incremental near-dup candidates (no re-hash)
    "dedup_incremental_pairs" -> out(Models.dedupIncrementalPairs),
    // end-to-end: curation ∩ train split → packed training sequences
    "training_corpus" -> out(Models.trainingCorpus),
    // per-shard manifest of the packed corpus (webdataset-style)
    "training_shards" -> out(Models.trainingShards),
    // one-row corpus datasheet (release-notes rollup)
    "corpus_datasheet" -> out(Models.corpusDatasheet),
    // blocked edit-distance entity resolution over the product catalog
    "fuzzy_name_match" -> out(Models.fuzzyNameMatch),
    // fuzzy edges closed transitively into catalog entity groups
    "name_match_clusters" -> out(Models.nameMatchClusters),
    // bigram-LM surprisal (conditional quality signal; word ORDER)
    "bigram_surprisal" -> out(Models.bigramSurprisalMat),
    // interpolated Kneser-Ney bigram model table (D = 1/2, exact counts)
    "kneser_ney_bigrams" -> out(Models.kneserNeyBigrams),
    // per-doc OOV rate vs the deterministic top-K corpus vocabulary
    "vocab_coverage" -> out(Models.vocabCoverage),
    // Heaps'-law vocabulary growth by corpus decile
    "vocab_growth" -> out(Models.vocabGrowth),
    // canonical Gopher rule-filter battery, all-integer evaluation
    "gopher_quality_rules" -> out(Models.gopherRules),
    // bigram collocation mining by micro-unit lift (ln-free PMI rank)
    "collocation_lift" -> out(Models.collocationLift),
    // Moore–Lewis cross-entropy-difference data selection
    "moore_lewis_selection" -> out(Models.mooreLewisSelection),
    // winnowing (MOSS) fingerprints: window-min k-gram selection
    "winnow_fingerprints" -> out(Models.winnowFingerprints),
    // partial-overlap candidates from shared winnowed fingerprints
    "winnow_shared_docs" -> out(Models.winnowSharedDocs),
    // winnowing detection quality vs the exact containment truth set
    "winnow_recall" -> out(Models.winnowRecall),
    // per-ingest batch novelty vs the standing shingle set
    "batch_novelty" -> out(Models.batchNovelty),
    // DSIR hashed-n-gram importance weights
    "dsir_weights" -> out(Models.dsirWeights),
    // gap-filled hourly metric series with LOCF carry
    "events_locf_hourly" -> out(Models.eventsLocfHourly),
    // CUBE grouping-sets rollup in one Expand pass
    "lineitem_cube" -> out(Models.lineitemCube),
    // CMS inner-product join cardinality estimate vs the exact size
    "join_size_estimate" -> out(Models.joinSizeEstimate),
    // the reference's declarative test suite as one audit table
    "dq_summary" -> out(Models.dqSummary),
    // distributed BPE training: learned merges + word segmentation
    "bpe_merges" -> out(Models.bpeMerges),
    "bpe_segmentation" -> out(Models.bpeSegmentation),
    // the tokenizer applied: per-doc true BPE token counts
    "bpe_token_counts" -> out(Models.bpeTokenCounts),
    // tokenizer fertility (pieces per word) by language
    "bpe_fertility" -> out(Models.bpeFertility),
    // id-assigned piece vocabulary via the two-phase global rank
    "bpe_vocab_ids" -> out(Models.bpeVocabIds),
    // unigram-LM tokenizer (EM-trained, Viterbi-segmented) + shoot-out
    "unigram_vocab" -> out(Models.unigramVocab),
    "unigram_segmentation" -> out(Models.unigramSegmentation),
    "tokenizer_fertility_compare" -> out(Models.tokenizerFertilityCompare),
    // S2+F1 differential gate: seed-CSV loader + cents_to_dollars
    // through a real CSV round trip (shared bytes with the oracle)
    "seed_csv_roundtrip" -> out(Models.seedCsvRoundtrip),
  ) ++
    // semantic layer M1-M10: the reference's 8 saved queries + planner
    // demos for ratio/median/percentile/offset/cumulative metric types
    // and entity joins.
    graft.semantic.Registry.savedQueries.map(q =>
      q.name -> out(Models.semanticQuery(q.name))).toMap ++
    // multi-model metric queries (cross-model composition on the
    // shared group key)
    graft.semantic.Registry.multiQueries.map(q =>
      q.name -> out(Models.semanticMultiQuery(q.name))).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "stg_customers" -> Sql.stgCustomersQ,
    "stg_orders" -> Sql.stgOrdersQ,
    "stg_order_items" -> Sql.stgOrderItemsQ,
    "stg_products" -> Sql.stgProductsQ,
    "stg_locations" -> Sql.stgLocationsQ,
    "stg_supplies" -> Sql.stgSuppliesQ,
    "order_items" -> Sql.orderItemsQ,
    "orders" -> Sql.ordersQ,
    "customers" -> Sql.customersQ,
    "mart_cdc" -> Sql.martCdcQ,
    "cdc_incremental_agg" -> Sql.cdcIncrementalAggQ,
    "customers_scd2" -> Sql.customersScd2Q,
    "products" -> Sql.productsQ,
    "locations" -> Sql.locationsQ,
    "supplies" -> Sql.suppliesQ,
    "supplier_rollup" -> Sql.supplierRollupQ,
    "customer_value_deciles" -> Sql.customerValueDecilesQ,
    "top_products_per_supplier" -> Sql.topProductsPerSupplierQ,
    "time_spine" -> Sql.timeSpineQ,
    "daily_summary" -> Sql.dailySummaryQ,
    "weekly_summary" -> Sql.weeklySummaryQ,
    "monthly_summary" -> Sql.monthlySummaryQ,
    "cohort_retention" -> Sql.cohortRetentionQ,
    "seasonal_trends" -> Sql.seasonalTrendsQ,
    "growth_metrics" -> Sql.growthMetricsQ,
    "revenue_rollup" -> Sql.revenueRollupQ,
    "monthly_order_stats" -> Sql.monthlyOrderStatsQ,
    "quarterly_revenue_pivot" -> Sql.quarterlyRevenuePivotQ,
    "revenue_cube" -> Sql.revenueCubeQ,
    "revenue_grouping_sets" -> Sql.revenueGroupingSetsQ,
    "daily_moving_stats" -> Sql.dailyMovingStatsQ,
    "daily_metrics_long" -> Sql.dailyMetricsLongQ,
    "revenue_anomalies" -> Sql.revenueAnomaliesQ,
    "revenue_ewma_anomalies" -> Sql.ewmaAnomaliesQ,
    "revenue_cusum" -> Sql.revenueCusumQ,
    "revenue_theilsen" -> Sql.revenueTheilSenQ,
    "revenue_stl" -> Sql.revenueStlQ,
    "revenue_holt" -> Sql.revenueHoltQ,
    "event_volume_hw" -> Sql.eventVolumeHwQ,
    "forecast_eval" -> Sql.forecastEvalQ,
    "mann_kendall" -> Sql.mannKendallQ,
    "revenue_runs_test" -> Sql.revenueRunsTestQ,
    "revenue_autocorr" -> Sql.revenueAutocorrQ,
    "revenue_gini" -> StatsSql.revenueGiniQ,
    "lorenz_deciles" -> StatsSql.lorenzDecilesQ,
    "benford_digits" -> StatsSql.benfordDigitsQ,
    "benford_summary" -> StatsSql.benfordSummaryQ,
    "event_benford" -> StatsSql.eventBenfordQ,
    "ks_weekend_drift" -> StatsSql.ksWeekendDriftQ,
    "customer_survival_km" -> StatsSql.customerSurvivalKmQ,
    "basket_rules" -> StatsSql.basketRulesQ,
    "customer_migration" -> StatsSql.customerMigrationQ,
    "order_gap_stats" -> StatsSql.orderGapStatsQ,
    "segment_priority_chi2" -> StatsSql.segmentPriorityChi2Q,
    "segment_priority_verdict" -> StatsSql.segmentPriorityVerdictQ,
    "product_trend_ols" -> StatsSql.productTrendOlsQ,
    "jw_name_pairs" -> StatsSql.jwNamePairsQ,
    "jw_recall" -> StatsSql.jwRecallQ,
    "event_type_xcorr" -> StatsSql.eventTypeXcorrQ,
    "daily_gapfill" -> Sql.dailyGapfillQ,
    "time_analytics" -> Sql.timeAnalyticsQ,
    "customer_segmentation" -> Sql.customerSegmentationQ,
    "dedup_exact" -> LlmSql.dedupExactQ,
    "dedup_normalized" -> LlmSql.normalizedDedupQ,
    "minhash_signatures" -> LlmSql.minhashSignaturesQ,
    "minhash_pairs" -> LlmSql.minhashPairsQ,
    "edit_distance_pairs" -> LlmSql.editDistancePairsQ,
    "simhash_signatures" -> LlmSql.simhashSignaturesQ,
    "simhash_pairs" -> LlmSql.simhashPairsQ,
    "ngram_jaccard_pairs" -> LlmSql.ngramJaccardPairsQ,
    "ngram_containment_pairs" -> LlmSql.ngramContainmentPairsQ,
    "dedup_lsh_recall" -> LlmSql.dedupLshRecallQ,
    "doc_shared_ngrams" -> LlmSql.docSharedNgramsQ,
    "substring_dedup" -> LlmSql.substringDedupQ,
    "dedup_clusters" -> LlmSql.dedupClustersQ,
    "ann_cosine_topk" -> LlmSql.annCosineTopKQ,
    "mmr_rerank" -> LlmSql.mmrRerankQ,
    "mmr_recall" -> LlmSql.mmrRecallQ,
    "ann_filtered_topk" -> LlmSql.annFilteredTopKQ,
    "ann_lsh_buckets" -> LlmSql.annLshBucketsQ,
    "ann_hard_negatives" -> LlmSql.annHardNegativesQ,
    "ann_matryoshka_recall" -> LlmSql.annMatryoshkaRecallQ,
    "embedding_dedup_pairs" -> LlmSql.embeddingDedupPairsQ,
    "ann_ivf_topk" -> LlmSql.annIvfTopKQ,
    "ann_ivf_kmeans_topk" -> LlmSql.annIvfKmeansTopKQ,
    "diversity_sample" -> LlmSql.diversitySampleQ,
    "semdedup_prune" -> LlmSql.semdedupPruneQ,
    "embedding_quantization" -> LlmSql.embeddingQuantizationQ,
    "embedding_corr" -> LlmSql.embeddingCorrQ,
    "embedding_pca" -> LlmSql.embeddingPcaQ,
    "embedding_pca_topk" -> LlmSql.embeddingPcaTopKQ,
    "ann_opq_topk" -> LlmSql.annOpqTopKQ,
    "ann_sq8_topk" -> LlmSql.annSq8TopKQ,
    "ann_recall" -> LlmSql.annRecallQ,
    "ann_recall_by_method" -> LlmSql.annRecallByMethodQ,
    "embedding_dedup_clusters" -> LlmSql.embeddingDedupClustersQ,
    "epoch_shuffle" -> LlmSql.epochShuffleQ,
    "pq_codes" -> LlmSql.pqCodesQ,
    "ann_pq_topk" -> LlmSql.annPqTopKQ,
    "ann_pq_adc_topk" -> LlmSql.annPqAdcTopKQ,
    "ann_pq_rerank_topk" -> LlmSql.annPqRerankTopKQ,
    "ann_ivfpq_topk" -> LlmSql.annIvfPqTopKQ,
    "ann_ivfpq_residual_topk" -> LlmSql.annIvfPqResidualTopKQ,
    "text_stats" -> LlmSql.textStatsQ,
    "doc_readability" -> LlmSql.readabilityQ,
    "shard_routing" -> LlmSql.shardRoutingQ,
    "shard_stability" -> LlmSql.shardStabilityQ,
    "corpus_curation" -> LlmSql.corpusCurationQ,
    "curation_report" -> LlmSql.curationReportQ,
    "media_features" -> LlmSql.mediaFeaturesQ,
    "media_ahash" -> LlmSql.mediaAHashQ,
    "media_ahash_pairs" -> LlmSql.mediaAHashPairsQ,
    "media_resized" -> LlmSql.mediaResizedQ,
    "media_frames" -> LlmSql.mediaFramesQ,
    "dataset_splits" -> LlmSql.datasetSplitsQ,
    "neyman_allocation" -> LlmSql.neymanAllocationQ,
    "kmeans_centroids" -> LlmSql.kmeansCentroidsQ,
    "bm25_scores" -> LlmSql.bm25Q,
    "sessionize" -> graft.operators.Sessions.oracleSql,
    "events_asof_purchase" -> OpsSql.eventsAsofPurchaseQ,
    "value_band_stats" -> OpsSql.valueBandStatsQ,
    "hll_user_counts" -> OpsSql.hllUserCountsQ,
    "hll_merged_users" -> OpsSql.hllMergedUsersQ,
    "hll_overlap_users" -> OpsSql.hllOverlapUsersQ,
    "hll_range_users" -> OpsSql.hllRangeUsersQ,
    "value_percentiles" -> OpsSql.valuePercentilesQ,
    "tfidf_top_terms" -> LlmSql.tfidfTopTermsQ,
    "doc_embeddings" -> LlmSql.hashedEmbeddingsQ,
    "hybrid_search" -> LlmSql.hybridSearchQ,
    "hybrid_recall" -> LlmSql.hybridRecallQ,
    "prf_search" -> LlmSql.prfSearchQ,
    "hybrid_rank_metrics" -> LlmSql.hybridRankMetricsQ,
    "quality_weights" -> LlmSql.qualityWeightsQ,
    "quality_predictions" -> LlmSql.qualityPredictionsQ,
    "quality_pareto" -> LlmSql.qualityParetoQ,
    "quality_eval" -> LlmSql.qualityEvalQ,
    "quality_calibration" -> LlmSql.qualityCalibrationQ,
    "quality_conformal" -> LlmSql.qualityConformalQ,
    "doc_surprisal" -> LlmSql.unigramSurprisalQ,
    "heldout_surprisal" -> LlmSql.heldoutSurprisalQ,
    "curriculum_bins" -> LlmSql.curriculumBinsQ,
    "event_props_stats" -> OpsSql.eventPropsStatsQ,
    "session_window_agg" -> OpsSql.sessionWindowAggQ,
    "stream_windowed_counts" -> graft.streaming.Streams.windowedCountsOracleSql,
    "stream_sessions" -> graft.streaming.Streams.sessionsOracleSql,
    "stream_segment_counts" -> graft.streaming.Streams.segmentCountsOracleSql,
    "stream_dedup" -> graft.streaming.Streams.ingestDedupOracleSql,
    "stream_attribution" -> graft.streaming.Streams.clickAttributionOracleSql,
    "stream_attribution_outer" -> graft.streaming.Streams.clickAttributionOuterOracleSql,
    "stream_sink_parquet" -> graft.streaming.Streams.parquetSinkOracleSql,
    "stream_neardup_pairs" -> LlmSql.dedupIncrementalPairsQ,
    "stream_neardup_multibatch" -> LlmSql.dedupIncrementalPairsQ,
    "stream_hybrid_index" -> LlmSql.streamHybridSearchQ,
    "stream_quality_scores" -> LlmSql.qualityStreamScoresQ,
    "stream_ivm_agg" -> graft.streaming.Streams.ivmAggOracleSql,
    "stream_hll_users" -> OpsSql.streamHllUsersQ,
    "stream_cms_heavy" -> CurateSql.cmsHeavyHittersQ,
    "stream_quantile_hist" -> OpsSql.histQuantilesQ,
    "stream_psi_monitor" -> OpsSql.featureDriftPsiQ,
    "stream_benford_monitor" -> StatsSql.eventBenfordQ,
    "stream_sink_merge" -> graft.streaming.Streams.mergeSinkOracleSql,
    "stream_user_rollup" -> graft.streaming.Streams.userRollupOracleSql,
    // the multi-batch runs share the one-batch oracles: the union of
    // the two time-split deliveries is the whole events table and the
    // split keeps event time monotone across batches
    "stream_sessions_multibatch" -> graft.streaming.Streams.sessionsOracleSql,
    "stream_segment_counts_multibatch" -> graft.streaming.Streams.segmentCountsOracleSql,
    "stream_attribution_multibatch" -> graft.streaming.Streams.clickAttributionOracleSql,
    "stream_user_rollup_multibatch" -> graft.streaming.Streams.userRollupOracleSql,
    "stream_dedup_multibatch" -> graft.streaming.Streams.ingestDedupOracleSql,
    "stratified_sample" -> OpsSql.stratifiedEventsQ,
    "skew_salted_enrich" -> OpsSql.skewSaltedEnrichQ,
    "pii_redaction" -> CurateSql.piiRedactionQ,
    "pii_redaction_shapes" -> CurateSql.piiRedactionShapesQ,
    "k_anonymity_audit" -> Sql.kAnonymityAuditQ,
    "forget_audit" -> OpsSql.forgetAuditQ,
    "l_diversity_audit" -> Sql.lDiversityAuditQ,
    "t_closeness_audit" -> Sql.tClosenessAuditQ,
    "decontamination" -> CurateSql.decontaminationQ,
    "doc_repetition" -> CurateSql.docRepetitionQ,
    "domain_mixture" -> CurateSql.domainMixtureQ,
    "mixture_temperature" -> CurateSql.mixtureTemperatureQ,
    "unimax_allocation" -> CurateSql.unimaxAllocationQ,
    "doc_chunks" -> CurateSql.docChunksQ,
    "chunk_boilerplate" -> CurateSql.chunkBoilerplateQ,
    "cms_heavy_hitters" -> CurateSql.cmsHeavyHittersQ,
    "hist_quantiles" -> OpsSql.histQuantilesQ,
    "event_funnel" -> OpsSql.eventFunnelQ,
    "event_seq_support" -> OpsSql.eventSeqSupportQ,
    "event_markov" -> OpsSql.eventMarkovQ,
    "funnel_latency" -> OpsSql.funnelLatencyQ,
    "top_docs_per_lang" -> LlmSql.topDocsPerLangQ,
    "lang_confusion" -> LlmSql.langConfusionQ,
    "split_leakage_audit" -> LlmSql.splitLeakageQ,
    "source_dup_matrix" -> LlmSql.sourceDupMatrixQ,
    "bloom_pruned_stats" -> OpsSql.bloomPrunedStatsQ,
    "events_asof_next_purchase" -> OpsSql.eventsAsofNextPurchaseQ,
    "zorder_keys" -> OpsSql.zorderKeysQ,
    "zorder_zonemaps" -> OpsSql.zorderZonemapsQ,
    "hilbert_keys" -> OpsSql.hilbertKeysQ,
    "hilbert_zonemaps" -> OpsSql.hilbertZonemapsQ,
    "layout_locality" -> OpsSql.layoutLocalityQ,
    "copurchase_edges" -> OpsSql.copurchaseEdgesQ,
    "copurchase_distances" -> OpsSql.copurchaseDistancesQ,
    "copurchase_triangles" -> OpsSql.copurchaseTrianglesQ,
    "copurchase_triangles_capped" -> OpsSql.copurchaseTrianglesCappedQ,
    "copurchase_triangles_approx" -> OpsSql.copurchaseTrianglesApproxQ,
    "triangles_approx_error" -> OpsSql.trianglesApproxErrorQ,
    "copurchase_clustering" -> OpsSql.copurchaseClusteringQ,
    "copurchase_clustering_capped" -> OpsSql.copurchaseClusteringCappedQ,
    "copurchase_clustering_approx" -> OpsSql.copurchaseClusteringApproxQ,
    "copurchase_kcore" -> OpsSql.copurchaseKcoreQ,
    "copurchase_bottleneck" -> OpsSql.copurchaseBottleneckQ,
    "copurchase_pagerank" -> OpsSql.copurchasePagerankQ,
    "copurchase_ppr" -> OpsSql.copurchasePprQ,
    "copurchase_pagerank_directed" -> OpsSql.copurchasePagerankDirectedQ,
    "copurchase_communities" -> OpsSql.copurchaseCommunitiesQ,
    "copurchase_closeness" -> OpsSql.copurchaseClosenessQ,
    "copurchase_closeness_approx" -> OpsSql.copurchaseClosenessApproxQ,
    "closeness_approx_error" -> OpsSql.closenessApproxErrorQ,
    "copurchase_distance_distribution" ->
      OpsSql.copurchaseDistanceDistributionQ,
    "copurchase_link_predictions" -> OpsSql.copurchaseLinkPredictionsQ,
    "orders_profile" -> Sql.ordersProfileQ,
    "order_correlations" -> Sql.orderCorrelationsQ,
    "event_key_skew" -> OpsSql.eventKeySkewQ,
    "feature_drift_psi" -> OpsSql.featureDriftPsiQ,
    "documents_profile" -> LlmSql.documentsProfileQ,
    "jsonl_ingest_audit" -> LlmSql.jsonlIngestAuditQ,
    "weighted_sample" -> LlmSql.weightedSampleQ,
    "pack_sequences" -> LlmSql.packSequencesQ,
    "length_bucketed_batches" -> LlmSql.lengthBucketedBatchesQ,
    "dedup_incremental_pairs" -> LlmSql.dedupIncrementalPairsQ,
    "training_corpus" -> LlmSql.trainingCorpusQ,
    "training_shards" -> LlmSql.trainingShardsQ,
    "corpus_datasheet" -> LlmSql.corpusDatasheetQ,
    "fuzzy_name_match" -> OpsSql.fuzzyNameMatchQ,
    "name_match_clusters" -> LlmSql.nameMatchClustersQ,
    "bigram_surprisal" -> LlmSql.bigramSurprisalQ,
    "kneser_ney_bigrams" -> LlmSql.kneserNeyBigramsQ,
    "vocab_coverage" -> LlmSql.vocabCoverageQ,
    "vocab_growth" -> LlmSql.vocabGrowthQ,
    "gopher_quality_rules" -> LlmSql.gopherRulesQ,
    "collocation_lift" -> LlmSql.collocationLiftQ,
    "moore_lewis_selection" -> LlmSql.mooreLewisQ,
    "winnow_fingerprints" -> LlmSql.winnowFingerprintsQ,
    "winnow_shared_docs" -> LlmSql.winnowSharedDocsQ,
    "winnow_recall" -> LlmSql.winnowRecallQ,
    "batch_novelty" -> LlmSql.batchNoveltyQ,
    "dsir_weights" -> LlmSql.dsirWeightsQ,
    "events_locf_hourly" -> OpsSql.eventsLocfHourlyQ,
    "lineitem_cube" -> OpsSql.lineitemCubeQ,
    "join_size_estimate" -> OpsSql.joinSizeEstimateQ,
    "dq_summary" -> Sql.dqSummaryQ,
    "bpe_merges" -> LlmSql.bpeMergesQ,
    "bpe_segmentation" -> LlmSql.bpeSegmentationQ,
    "bpe_token_counts" -> LlmSql.bpeTokenCountsQ,
    "bpe_fertility" -> LlmSql.bpeFertilityQ,
    "bpe_vocab_ids" -> LlmSql.bpeVocabIdsQ,
    "unigram_vocab" -> LlmSql.unigramVocabQ,
    "unigram_segmentation" -> LlmSql.unigramSegmentationQ,
    "tokenizer_fertility_compare" -> LlmSql.tokenizerFertilityCompareQ,
    // S2+F1: the oracle reads the SAME CSV bytes the engine wrote and
    // re-applies the cents_to_dollars macro arithmetic
    "seed_csv_roundtrip" ->
      s"""select id, name, nation_id, cast(balance / 100 as decimal(16,2)) as balance_dollars, segment
         |from read_csv('${graft.sources.Seeds.RoundtripDir}/*.csv', header=true,
         |  columns={'id': 'BIGINT', 'name': 'VARCHAR', 'nation_id': 'INTEGER', 'balance': 'DOUBLE', 'segment': 'VARCHAR'})""".stripMargin,
  ) ++
    graft.semantic.Registry.savedQueries.map(q =>
      q.name -> graft.semantic.OracleGen.savedQuery(q, graft.semantic.Registry, Sql.allCtes)).toMap ++
    graft.semantic.Registry.multiQueries.map(q =>
      q.name -> graft.semantic.OracleGen.multiQuery(q, graft.semantic.Registry, Sql.allCtes)).toMap
}
