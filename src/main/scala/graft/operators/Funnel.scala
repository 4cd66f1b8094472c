package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered multi-stage funnel — the classic product-analytics operator
  * (view → click → purchase): a user counts for stage i only with an
  * event of that type STRICTLY AFTER their first qualifying event of
  * stage i−1, so out-of-order histories (a purchase before ever
  * viewing) do not inflate conversion.
  *
  * Shape at scale: one aggregation per stage, each keyed on user_id —
  * stage i's input is stage i−1's (user_id, first_ts) result joined
  * back to the events of type i, so every shuffle carries (user_id,
  * timestamp) pairs, never event payloads, and the stage DAG is a
  * chain of hash joins AQE can plan from runtime sizes. The final
  * summary is |stages| rows of counts + ratios.
  *
  * Determinism: stage entry is min(ts) per user (unique regardless of
  * partitioning), counts are exact longs, and each conversion ratio is
  * a single double division of exact counts.
  */
object Funnel {

  /** Stage sequence for the registered `event_funnel` query. */
  val Stages: Seq[String] = Seq("view", "click", "purchase")

  /** One row per stage: (stage, stage_idx, n_users, conv_from_prev,
    * conv_from_first). `conv_from_prev` is 1.0 for the first stage. */
  /** reached(i): (user_id, __t = first time the user completed stages
    * 0..i) — the per-user completion chain [[funnel]] counts and
    * [[funnelLatency]] times. */
  private def reachedChain(events: DataFrame,
                           stages: Seq[String]): Seq[DataFrame] = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      "stages must be non-empty and distinct")
    stages.zipWithIndex.foldLeft(Seq.empty[DataFrame]) {
      case (acc, (stage, i)) =>
        val typed = events.filter(col("event_type") === stage)
          .select(col("user_id"), col("ts"))
        val reached =
          if (i == 0) typed.groupBy("user_id").agg(min("ts").as("__t"))
          else typed
            .join(acc.last.withColumnRenamed("__t", "__prev_t"), "user_id")
            .filter(col("ts") > col("__prev_t"))
            .groupBy("user_id").agg(min("ts").as("__t"))
        acc :+ reached
    }
  }

  def funnel(events: DataFrame, stages: Seq[String] = Stages): DataFrame = {
    val reachedPerStage = reachedChain(events, stages)
    val counts = stages.zip(reachedPerStage).zipWithIndex
      .map { case ((stage, reached), i) =>
        reached.agg(count(lit(1)).as("n_users"))
          .select(lit(stage).as("stage"), lit(i.toLong).as("stage_idx"),
            col("n_users"))
      }
      .reduce(_.unionAll(_))
    val first = counts.filter(col("stage_idx") === 0)
      .select(col("n_users").as("__n_first"))
    val prev = counts.select(col("stage_idx").as("__prev_idx"),
      col("n_users").as("__n_prev"))
    counts
      .join(prev, col("stage_idx") === col("__prev_idx") + 1, "left")
      .crossJoin(broadcast(first))
      .select(
        col("stage"), col("stage_idx"), col("n_users"),
        when(col("stage_idx") === 0, lit(1.0))
          .otherwise(col("n_users").cast("double") / col("__n_prev").cast("double"))
          .as("conv_from_prev"),
        (col("n_users").cast("double") / col("__n_first").cast("double"))
          .as("conv_from_first"))
  }

  /** FUNNEL STAGE LATENCY — how long converting users take between
    * adjacent stages, the number that turns a funnel from counts into
    * a diagnosis (a 90th-percentile view→click of hours is a product
    * problem counts can't show). One row per transition with the
    * converted-user count and interpolated p50/p90/p99 of the
    * first-completion time delta in SECONDS. The percentile
    * interpolates over exact integer MICRO deltas, then divides by
    * 10^6 BEFORE a decimal(18,9) quantization — both halves matter
    * and both were caught by the differential gate: quantizing raw
    * micros leaves the engines' last-ulp interpolation divergence
    * (~1e-4 absolute at 10^12 magnitudes) wider than any usable
    * decimal step, and quantizing seconds at scale 6 puts the EXACT
    * values on half-boundaries (p90 of integer micros is a multiple
    * of 0.1 µs = an odd half of 1e-6 s, where Spark's HALF_UP and
    * DuckDB's half-even disagree systematically). At scale 9 the
    * exact values (multiples of 1e-8 s) are a full 5e-10 from every
    * half-step while the ulp noise is ~1e-10. Deltas are strictly
    * positive by the funnel's
    * strictly-after construction. Scale: each transition joins two
    * (user_id, ts) stage results — timestamps only, never event
    * payloads; the percentile sorts one long per CONVERTED user. */
  def funnelLatency(events: DataFrame,
                    stages: Seq[String] = Stages): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val chain = reachedChain(events, stages)
    def q(c: org.apache.spark.sql.Column) =
      (c / lit(1000000.0)).cast(DecimalType(18, 9)).cast("double")
    (1 until stages.size).map { i =>
      chain(i).withColumnRenamed("__t", "__t_cur")
        .join(chain(i - 1).withColumnRenamed("__t", "__t_prev"), "user_id")
        .select((unix_micros(col("__t_cur")) -
          unix_micros(col("__t_prev"))).as("__d"))
        .agg(count(lit(1)).as("n_users"),
          expr("percentile(__d, array(0.5D, 0.9D, 0.99D))").as("__p"))
        .select(
          lit(stages(i - 1)).as("from_stage"),
          lit(stages(i)).as("to_stage"),
          lit(i.toLong).as("stage_idx"),
          col("n_users"),
          q(element_at(col("__p"), 1)).as("p50_seconds"),
          q(element_at(col("__p"), 2)).as("p90_seconds"),
          q(element_at(col("__p"), 3)).as("p99_seconds"))
    }.reduce(_ unionAll _)
  }
}
