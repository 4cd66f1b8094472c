package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.BoundedWindow

/** Domain-mixture rebalancing — downsample over-represented domains
  * (languages, sources, crawls) to a TARGET mixture, the step that
  * turns a raw corpus into a training mix. Target shares are basis
  * points (1/10000) per domain; a domain needing more than it has is
  * kept whole (no upsampling — duplication is dedup's enemy), and a
  * domain absent from the target map is dropped (the mixture is the
  * explicit contract of what trains).
  *
  * Keep decisions are the pipeline's standard salted-hash-bucket
  * device ([[Splits]]): `keep_bp(domain) = min(10000,
  * target_bp * N / n_domain)` in pure INTEGER arithmetic (exactly
  * mirrorable — no float rounding disagreement at keep boundaries),
  * and a document survives iff its salted 0..9999 bucket is below its
  * domain's keep_bp. Reproducible across runs/engines/partitionings,
  * and growth-stable the way an RNG-based `sample()` is not.
  *
  * At 100 TB: one tiny aggregation (|domains| rows) broadcast back
  * onto the corpus — the corpus itself sees a single scan with a
  * projection + filter; no shuffle of the data being sampled.
  */
object Mixture {

  val MixSalt = "mix|"

  /** Target mixture for the registered query: equal fifths across the
    * corpus languages (en is ~44% of the driver's documents table, so
    * the rebalance visibly downsamples it). */
  val QueryTargetBp: Map[String, Long] = Map(
    "en" -> 2000L, "de" -> 2000L, "es" -> 2000L, "fr" -> 2000L, "zh" -> 2000L)

  /** 0..9999 salted bucket for an id column ([[Splits.saltedBucket]]). */
  private def bucket(id: org.apache.spark.sql.Column) =
    Splits.saltedBucket(MixSalt, id, 10000L)

  /** Rebalance `df` to `targetBp` over `domainCol`. N is the TOTAL row
    * count (all domains, dropped ones included) so shares are of the
    * incoming corpus. Output keeps the surviving rows' id + domain plus
    * the decision columns (mix_bucket, keep_bp) for auditability. */
  def rebalance(df: DataFrame, idCol: String, domainCol: String,
                targetBp: Map[String, Long]): DataFrame = {
    require(targetBp.values.forall(bp => bp >= 0 && bp <= 10000),
      "target shares are basis points in 0..10000")
    val spark = df.sparkSession
    import spark.implicits._
    // deterministic map order so the tiny dim's row order is stable
    val bpDf = targetBp.toSeq.sortBy(_._1).toDF(domainCol, "__bp")
    val counts = df.groupBy(domainCol).agg(count(lit(1)).as("__n"))
    // |domains| rows: the cross join is a broadcast of ONE total row
    val totals = counts.agg(sum("__n").as("__total"))
    // `div`, not `/`: Spark's `/` on bigints is DOUBLE division; the
    // keep threshold must stay pure integer arithmetic (truncating,
    // same as DuckDB's `//` on non-negatives) or boundary buckets
    // could disagree across engines.
    val keep = counts.crossJoin(broadcast(totals))
      .join(bpDf, domainCol)
      .selectExpr(domainCol,
        "least(10000L, (__bp * __total) div __n) as keep_bp")
    df.select(col(idCol), col(domainCol), bucket(col(idCol)).as("mix_bucket"))
      .join(broadcast(keep), domainCol)
      .filter(col("mix_bucket") < col("keep_bp"))
      .select(col(idCol), col(domainCol), col("mix_bucket"), col("keep_bp"))
  }

  /** Driver query: documents rebalanced to [[QueryTargetBp]] over
    * `lang`. */
  def domainMixture(documents: DataFrame): DataFrame =
    rebalance(documents, "doc_id", "lang", QueryTargetBp)

  val TempSalt = "mixT|"

  /** Exact integer sqrt of a non-negative bigint column:
    * floor(sqrt(n)) via the correctly-rounded double sqrt plus a ±1
    * boundary correction, so the result is the true isqrt in BOTH
    * engines regardless of float rounding at perfect squares (n < 2^53
    * converts to double exactly; IEEE sqrt is correctly rounded — the
    * correction is belt-and-braces for anything larger). */
  private def isqrt(n: org.apache.spark.sql.Column) = {
    val s0 = floor(sqrt(n.cast("double"))).cast("long")
    when(s0 * s0 > n, s0 - 1)
      .when((s0 + 1) * (s0 + 1) <= n, s0 + 1)
      .otherwise(s0)
  }

  /** TEMPERATURE-scaled mixture (T = 2, the mT5/data-mixing recipe):
    * instead of a hand-written target map, target shares are derived
    * FROM the observed distribution — share_d ∝ n_d^(1/T) — which
    * flattens head domains and boosts the tail without inverting the
    * order. T = 2 makes the weight an integer sqrt, so the whole
    * derivation (weights, shares, keep thresholds) stays in exact
    * integer arithmetic and cross-engine keep decisions cannot drift
    * at bucket boundaries. No upsampling, same as [[rebalance]]: a
    * tail domain whose boosted share exceeds its mass is kept whole.
    *
    * Same 100 TB shape as rebalance: one |domains|-row aggregate
    * broadcast back onto a single corpus scan. */
  def temperatureRebalance(df: DataFrame, idCol: String,
                           domainCol: String): DataFrame = {
    val counts = df.groupBy(domainCol).agg(count(lit(1)).as("__n"))
    val w = counts.withColumn("__w", isqrt(col("__n")))
    val tot = w.agg(sum("__w").as("__wtot"), sum("__n").as("__total"))
    val keep = w.crossJoin(broadcast(tot))
      .selectExpr(domainCol,
        "(10000L * __w) div __wtot as target_bp",
        "least(10000L, (((10000L * __w) div __wtot) * __total) div __n) as keep_bp")
    df.select(col(idCol), col(domainCol),
        Splits.saltedBucket(TempSalt, col(idCol), 10000L).as("mix_bucket"))
      .join(broadcast(keep), domainCol)
      .filter(col("mix_bucket") < col("keep_bp"))
      .select(col(idCol), col(domainCol), col("target_bp"),
        col("mix_bucket"), col("keep_bp"))
  }

  /** Driver query: documents rebalanced to the T=2 temperature mixture
    * over `lang`. */
  def mixtureTemperature(documents: DataFrame): DataFrame =
    temperatureRebalance(documents, "doc_id", "lang")

  /** UniMax epoch cap for [[unimaxAllocation]]: no language repeats
    * more than this many epochs, however much budget is left. */
  val UnimaxMaxEpochs = 2L

  /** Registered budget = 18/10 of total corpus chars — a deliberate
    * OVER-subscription (you cannot give everyone 1.8 epochs under a
    * 2-epoch cap without the head language hitting the water line), so
    * the query exercises both regimes at every SF: the four tail
    * languages cap at exactly 2.0 epochs and `en` is budget-limited. */
  val UnimaxBudgetNum = 18L
  val UnimaxBudgetDen = 10L

  /** UNIMAX language-budget allocation (Chung et al. 2023): given a
    * per-domain corpus size and a total training budget `B` chars with
    * a hard per-domain epoch cap `C`, water-fill the budget — every
    * domain gets `min(C·n_d, t)` chars where the water line `t` is the
    * largest integer level the budget covers. Low-resource domains
    * train their full `C` epochs; high-resource domains split the
    * remaining budget evenly. This is the sampling policy that
    * replaced temperature mixing for mT5-class multilingual training
    * — temperature ([[temperatureRebalance]]) still over-samples the
    * head and starves the tail; UniMax is the max-min-fair limit.
    *
    * Closed form, no iteration: sort domains by cap ascending (tie:
    * domain asc); domain `i` (of L, prefix sums `P_i`) is capped iff
    * `cap_i·(L−i+1) + P_{i−1} ≤ B` — that predicate is monotone in `i`
    * for ascending caps, so the capped set is a prefix of length K and
    * `t = (B − P_K) div (L−K)`. Everything is exact int64 (truncating
    * `div` on non-negatives ≡ DuckDB `//`); the sub-`t` remainder is
    * REPORTED as `leftover_chars`, not silently smeared.
    *
    * At 100 TB the whole computation runs on the |domains|-row
    * aggregate of one corpus scan; the global window ranks a
    * bounded-cardinality dim (languages), never the corpus. */
  def unimaxAllocation(df: DataFrame, domainCol: String,
                       charsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(domainCol)
      .agg(sum(col(charsCol)).cast("long").as("n_chars"))
      .withColumn("cap_chars", col("n_chars") * lit(UnimaxMaxEpochs))
    // bounded dim: |languages| rows — the global window is safe here
    val byCap = BoundedWindow.orderBy(col("cap_chars"), col(domainCol))
    val ranked = counts
      .withColumn("__i", row_number().over(byCap))
      .withColumn("__prefix", sum(col("cap_chars")).over(
        byCap.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = counts.agg(sum("n_chars").as("__total"),
      count(lit(1)).as("__nlang"))
    val flagged = ranked.crossJoin(broadcast(tot))
      .withColumn("__budget",
        expr(s"(__total * $UnimaxBudgetNum) div $UnimaxBudgetDen"))
      .withColumn("__capped",
        col("cap_chars") * (col("__nlang") - col("__i") + 1) +
          (col("__prefix") - col("cap_chars")) <= col("__budget"))
    // K and P_K from the tiny flagged dim; guard the all-capped case
    val kRow = flagged.agg(
      count(when(col("__capped"), 1)).as("__k"),
      coalesce(sum(when(col("__capped"), col("cap_chars"))), lit(0L))
        .as("__pk"))
    flagged.crossJoin(broadcast(kRow))
      .withColumn("__t",
        when(col("__nlang") > col("__k"),
          expr("(__budget - __pk) div (__nlang - __k)")))
      .select(
        col(domainCol), col("n_chars"), col("cap_chars"),
        when(col("__capped"), col("cap_chars"))
          .otherwise(least(col("cap_chars"), col("__t")))
          .as("allocated_chars"),
        col("__capped").as("is_capped"),
        col("__budget").as("budget_chars"),
        when(col("__nlang") > col("__k"),
          expr("(__budget - __pk) % (__nlang - __k)"))
          .otherwise(col("__budget") - col("__pk")).as("leftover_chars"))
      .withColumn("epochs_bp",
        expr("(allocated_chars * 10000) div n_chars"))
  }

  /** Driver query: UniMax char budget over `lang` at
    * [[UnimaxBudgetNum]]/[[UnimaxBudgetDen]] of corpus chars, epoch cap
    * [[UnimaxMaxEpochs]]. */
  def unimaxBudget(documents: DataFrame): DataFrame =
    unimaxAllocation(documents, "lang", "n_chars")
}
