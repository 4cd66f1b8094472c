package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Blanket anti-pattern audit over EVERY registered batch query's
  * physical plan: no cartesian products anywhere, and no
  * nested-loop joins outside the explicit allowlist of queries whose
  * crossJoin broadcasts a BOUNDED side by design (query sets,
  * centroids, corpus stats — documented in their operators). A new
  * query that accidentally plans a nested loop over two scaling
  * inputs fails here before it fails at 100 TB.
  */
class PlanGuardSpec extends SparkSpec {

  /** Queries whose plan legitimately contains a broadcast nested loop:
    * one side is a bounded broadcast (≤ K rows / one stats row). */
  private val boundedCrossAllowed = Set(
    "ann_cosine_topk", "ann_filtered_topk", "ann_ivf_topk", "ann_ivf_kmeans_topk",
    // these compose annCosineTopK's bounded broadcast query set
    "ann_sq8_topk", "ann_recall", "ann_recall_by_method", "ann_pq_topk", "ann_pq_adc_topk",
    // same bounded broadcast query-set scan (wrong-label filter /
    // prefix-truncated corpus per MRL arm)
    "ann_hard_negatives", "ann_matryoshka_recall",
    // INDEX-FED since r13: candidates come from the kmeans-IVF probe,
    // whose only BNLJ is centroidRanked's bounded broadcast centroid
    // set (the ann_ivf_kmeans_topk shape) — no corpus × queries scan
    // remains; the greedy rerank itself is a groupByKey over ≤N-row groups
    "mmr_rerank",
    // recall harness: the EXACT-fed arm's corpus × bounded broadcast
    // query set is the ground truth being measured, not a serving path
    // (the hybrid_recall precedent), plus the index arm's centroid BNLJ
    "mmr_recall",
    // ADC candidate stage composes annCosineTopKAsym's bounded
    // broadcast query set; the re-rank joins are broadcast HASH joins
    "ann_pq_rerank_topk",
    // centroidRanked crossJoins the bounded broadcast centroid set
    "ann_ivfpq_topk", "ann_ivfpq_residual_topk", "diversity_sample",
    "semdedup_prune",
    "kmeans_centroids", "bm25_scores", "tfidf_top_terms",
    "hll_user_counts", "corpus_curation", "value_percentiles",
    // three one-row aggregates cross-joined
    "corpus_datasheet",
    // |vocab-join rows| × ONE broadcast corpus-total row
    "doc_surprisal",
    // filtered bigram rows × ONE broadcast corpus-total row
    "collocation_lift",
    // |vocab| model rows × ONE broadcast (t_in,v_in,t_gen,v_gen) row
    "moore_lewis_selection",
    // 256 bucket-model rows × ONE broadcast (t_tgt,t_raw) row
    "dsir_weights",
    // calendar-hour spine × the broadcast |event_types| list
    "events_locf_hourly",
    // validation tf rows × ONE broadcast train-stats row
    "heldout_surprisal",
    // |domains| counts × ONE broadcast total row (Mixture.rebalance)
    "domain_mixture",
    // |domains| isqrt-weight rows × ONE broadcast (wtot, total) row
    // (Mixture.temperatureRebalance)
    "mixture_temperature",
    // ≤ HistBins cumulative rows × |HistQs| broadcast quantile literals
    "hist_quantiles",
    // the same bounded quantile-literal crossJoin over the MERGED
    // per-batch counters (serving read of the streaming twin)
    "stream_quantile_hist",
    // events × ONE broadcast (ref_month, cur_month) bounds row, plus
    // the |types|×16 broadcast bin spine (empty-bin smoothing terms)
    "feature_drift_psi",
    // the same bounded bin-spine crossJoin over MERGED per-batch
    // counters (serving read of the streaming monitor)
    "stream_psi_monitor",
    // ONE broadcast global-count row (the sensitive-distribution N)
    "t_closeness_audit",
    // ≤3650 daily rows × ONE broadcast (n, s) series-stats row
    "revenue_cusum",
    // six ONE-ROW audit aggregates cross-joined broadcast
    "forget_audit",
    // calendar-bounded daily table × its own broadcast copy (≤3650²/2
    // pair inequality join) + two one-row median/count broadcasts
    "revenue_theilsen",
    // composes annCosineTopK's bounded broadcast query set over the
    // Mat'd OPQ-reconstructed corpus (the ann_pq_topk shape)
    "ann_opq_topk",
    // per-hop masses × three ONE-ROW broadcast summary frames
    // (totals, t90 pick, strength row)
    "copurchase_distance_distribution",
    // edges × ONE broadcast (keep_num, keep_den) params row (the
    // budget-derived sampling probability), and counts × the same row
    "copurchase_triangles_approx",
    // composes the same sampled-triangle params-row crossJoin (the
    // clustering projection adds only an equi-join on node)
    "copurchase_clustering_approx",
    // two ONE-ROW count/sum aggregates (exact vs sampled totals)
    // cross-joined broadcast, plus the sampled arm's params row
    "triangles_approx_error",
    // daily rows × ONE broadcast fitted-line row, 7 dow rows × ONE
    // broadcast centering row, rows × ONE broadcast strength row
    "revenue_stl",
    // pattern rows × ONE broadcast total-users row
    "event_seq_support",
    // bounded |types| × |types| dense-matrix crossJoins (broadcast
    // type lists / one-row n_types / the |types|-row π table)
    "event_markov",
    // |bigram types| model rows × ONE broadcast type-count row
    "kneser_ney_bigrams",
    // embeds hybrid_recall's exact baseline (bounded broadcast query
    // set over the corpus — the recall harness's deliberate full scan)
    "hybrid_rank_metrics",
    // |stages| count rows × ONE broadcast first-stage row (Funnel)
    "event_funnel",
    // calendar-bounded daily table × its own broadcast ≤H-day lookback
    // (inequality join over ≤3650 × ≤16 matched rows)
    "revenue_ewma_anomalies",
    // ONE exact-counts row × ONE merged-estimate row
    "hll_merged_users",
    // ONE exact-overlap row × THREE one-row sketch estimates
    "hll_overlap_users",
    // corpus × ONE broadcast 3-threshold row (Curriculum.bins)
    "curriculum_bins",
    // ONE broadcast corpus-stats row in the BM25 arm (the semantic arm
    // is index-probed since r12 — no corpus crossJoin remains)
    "hybrid_search",
    // the recall harness's EXACT baseline arm: corpus × the bounded
    // broadcast query-vector sample (that full scan is the ground
    // truth being measured against, not a serving path)
    "hybrid_recall",
    // ONE day-count row × ONE exact row × ONE estimate row
    "hll_range_users",
    // Ranks.globalRank offset join: |shuffle partitions| count rows ×
    // the same broadcast (bounded by cluster config, not data; the
    // mart-reading rank queries hide it behind Mat — this one ranks
    // live)
    "bpe_vocab_ids",
    // live globalRank offset join + corpus × ONE broadcast total row
    // (Quantiles.exactBuckets)
    "customer_value_deciles",
    // the same live exactBuckets shape over predictions / zorder keys
    // / the vocab-growth doc deciles
    "quality_calibration", "zorder_zonemaps", "vocab_growth",
    // truth-side counts row × ONE broadcast candidate-count row
    // (Dedup.lshRecallStats)
    "dedup_lsh_recall",
    // the same truth-row × broadcast candidate-row shape for the
    // winnowing detector's recall harness
    "winnow_recall",
    // ONE exact join-size row × ONE broadcast CMS-estimate row
    // (Sketches.joinSizeEstimate — both sides are global aggregates)
    "join_size_estimate",
    // |languages| dim rows × ONE broadcast totals row, then × ONE
    // broadcast water-line row (Mixture.unimaxAllocation)
    "unimax_allocation",
    // ONE confusion row × ONE broadcast rank-sum row
    // (QualityModel.evaluation)
    "quality_eval",
    // r14 stats family: each crossJoins ONE broadcast stats row
    // (grand totals / n / ks_num argmax row) and/or runs the
    // Ranks|Scans P²-offsets non-equi self-join over ≤P
    // partition-total rows (P = shuffle partitions, never data)
    "revenue_gini", "lorenz_deciles", "benford_digits", "benford_summary",
    "ks_weekend_drift", "customer_survival_km", "basket_rules",
    // exactBuckets rank (the zorder_zonemaps shape) + the twelve-row
    // broadcast box grid × 64-row zonemap catalogs
    "hilbert_zonemaps", "layout_locality",
    // per-shard loads × ONE broadcast total-count row
    "shard_routing",
    // digit rows × ONE broadcast total row (batch + streaming serve)
    "event_benford", "stream_benford_monitor",
    // 25 contingency cells × ONE broadcast grand-total row
    "segment_priority_chi2", "segment_priority_verdict",
    // calendar-bounded daily table × its own broadcast copy (≤3650²/2
    // pair inequality join — the theilsen shape) + one-row stat rows
    "mann_kendall",
    // two live Ranks offset joins (one per period) + one-row n rows
    "customer_migration",
    // gap buckets × ONE broadcast total row
    "order_gap_stats",
    // ≤3650 daily rows × ONE broadcast (n)/(median) row
    "revenue_runs_test",
    // r15: the DELIBERATE exact all-pairs truth set over the
    // vocabulary-bounded distinct-name dictionary (V·(V−1)/2 pairs,
    // corpus-size-free) + the lshRecallStats one-row broadcast shape
    "jw_recall",
    // |languages| dim rows × ONE broadcast totals row
    "neyman_allocation",
    // holdout rows × ONE broadcast q̂ row × ONE broadcast n_cal row,
    // per alpha (QualityModel.conformal)
    "quality_conformal")

  /** The streaming one-shots run whole jobs at build time; plan
    * inspection happens through their own specs instead. dq_summary
    * likewise since r8: its 17 rule subplans execute as CONCURRENT
    * jobs at construction (VERDICT r7 #5) and the returned frame is
    * the collected 36-row local relation — the subplans' shapes are
    * covered by DqSummarySpec. */
  private val skip = Set(
    "stream_windowed_counts", "stream_sessions", "stream_segment_counts",
    "stream_dedup", "stream_attribution", "stream_attribution_outer",
    "stream_user_rollup", "stream_neardup_pairs", "stream_neardup_multibatch",
    "stream_hybrid_index", "stream_quality_scores",
    "stream_sessions_multibatch", "stream_segment_counts_multibatch",
    "stream_attribution_multibatch", "stream_user_rollup_multibatch",
    "stream_dedup_multibatch",
    "dq_summary")

  /** Queries whose GLOBAL (unpartitioned) window runs over a side
    * whose row count is bounded by the schema, not the data — 25
    * locations, ~80 months, 7 years, K centroids — where a
    * single-partition window is the correct plan (two-phase
    * range-partitioned ranking would only add a shuffle). Global
    * windows over SF-scaling dims must use operators/Ranks instead
    * (RanksSpec asserts products/supplies do). */
  /** r17: EMPTY by design. Every deliberate bounded-domain global
    * window now declares an explicit constant partition key through
    * operators.BoundedWindow (the session excludes Catalyst's
    * EliminateWindowPartitions so the key survives), so ANY
    * empty-partitionSpec WindowExec in a registered plan is an
    * accident and fails this guard. The former entries (calendar
    * grains, deciles, |strata|, distinct margins, hop counts, |event
    * types|) live on as call-site comments next to their
    * BoundedWindow.orderBy. */
  private val boundedGlobalWindowAllowed = Set.empty[String]

  test("no cartesian products, unexpected nested loops, or unpartitioned windows over scaling dims") {
    // AQE wraps the whole plan in a single AdaptiveSparkPlanExec LEAF,
    // hiding every operator from a children traversal (the RanksSpec /
    // BucketedJoinSpec gotcha) — the audit must run with AQE off or it
    // inspects exactly one node and passes vacuously.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val offenders = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot { case (name, _) => skip.contains(name) }
        .flatMap { case (name, fn) =>
          val plan = fn(spark, sf).queryExecution.executedPlan
          def all(p: SparkPlan): Seq[SparkPlan] =
            p +: (p.children ++ p.subqueries).flatMap(all)
          val nodes = all(plan)
          assert(nodes.length > 1, s"$name: audit saw a collapsed plan")
          val cart = nodes.collect { case c: CartesianProductExec => c }
          val bnlj = nodes.collect { case j: BroadcastNestedLoopJoinExec => j }
          val globalWin = nodes.collect {
            case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w
          }
          (if (cart.nonEmpty) Seq(s"$name: CartesianProduct") else Nil) ++
            (if (bnlj.nonEmpty && !boundedCrossAllowed.contains(name))
              Seq(s"$name: BroadcastNestedLoopJoin") else Nil) ++
            (if (globalWin.nonEmpty && !boundedGlobalWindowAllowed.contains(name))
              Seq(s"$name: unpartitioned WindowExec") else Nil)
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    assert(offenders.isEmpty, s"anti-pattern plans: ${offenders.mkString("; ")}")
  }

  test("every crossJoin call site carries an explicit broadcast hint") {
    // VERDICT r11 #6: every crossJoin in this repo is by design a
    // bounded side (one-row stats, query sets, centroids) × a larger
    // relation — the hint is both documentation and a planner
    // guarantee. A new crossJoin site without the hint fails here
    // instead of surfacing in review (or worse, as a runtime
    // CartesianProduct when the bounded side's estimate is off).
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src", "main", "scala")
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        Iterator.unfold(0) { from =>
          val i = txt.indexOf("crossJoin(", from)
          if (i < 0) None else Some((i, i + "crossJoin(".length))
        }.filterNot { i =>
          txt.drop(i + "crossJoin(".length).replaceAll("^\\s+", "")
            .startsWith("broadcast(")
        }.map { i =>
          val line = txt.substring(0, i).count(_ == '\n') + 1
          s"$p:$line"
        }
      }.toSeq
    assert(offenders.isEmpty,
      s"crossJoin sites missing an explicit broadcast hint: ${offenders.mkString(", ")}")
  }

  test("the k-means TRAINING plan (pre-Mat) broadcasts its cross joins") {
    // the registered kmeans_centroids query reads the Mat-materialized
    // table, so the blanket audit above sees only a scan — the Lloyd
    // training plan that executes at mart-BUILD time must be audited
    // directly or a lost broadcast (CartesianProduct over the corpus)
    // would ship unguarded
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = graft.llm.Kmeans.centroids(Tables.embeddings(spark, sf))
        .queryExecution.executedPlan
      def all(p: SparkPlan): Seq[SparkPlan] =
        p +: (p.children ++ p.subqueries).flatMap(all)
      assert(!all(plan).exists(_.isInstanceOf[CartesianProductExec]),
        "Lloyd training plan contains a CartesianProduct")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
