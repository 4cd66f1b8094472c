package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RIGHT-TO-BE-FORGOTTEN scrub audit — the deletion-propagation
  * counterpart of the release audits (k-anonymity / l-diversity /
  * t-closeness) and PII redaction: given a forget set of users, prove
  * the scrub REACHED every derived artifact. One row per artifact
  * stage with before/after/removed row counts and the residual
  * reference count the audit exists to drive to zero:
  *
  *  - `events`: the raw fact scrub (plain filter);
  *  - `sessions`: a DERIVED mart rebuilt from the scrubbed fact —
  *    deletion must propagate through the sessionizer, not just the
  *    source table;
  *  - `distinct_users`: the cardinality story, with exact distinct
  *    counts as rows_before/after AND the global HLL estimates
  *    alongside (est_before/est_after) — the governance insight this
  *    row documents: aggregates and marts FILTER, but sketches cannot
  *    forget (register maxima are not invertible), so every stored
  *    sketch over a scrubbed corpus must be REBUILT, which is exactly
  *    what est_after is.
  *
  * The forget set is user_id % [[ForgetMod]] = [[ForgetRes]] (a
  * deterministic stand-in for the per-request id list production
  * receives).
  *
  * Determinism: every count is exact; the only doubles are the HLL
  * estimates, whose arithmetic is the gated
  * [[Sketches.hllEstimateByGroup]] chain (exact integer registers,
  * one final division, quantized-ln linear counting).
  *
  * Scale: two fact scans (before/after) per stage family, each a
  * hash-partitioned aggregate; the audit rows are one-row aggregates
  * cross-joined broadcast. Nothing is pairwise, nothing collects. */
object Forget {

  val ForgetMod = 97L
  val ForgetRes = 5L

  def forgetAudit(events: DataFrame): DataFrame = {
    val fcond = col("user_id") % ForgetMod === ForgetRes
    val scrub = events.filter(!fcond)

    def stage(name: String, before: DataFrame, after: DataFrame): DataFrame =
      before.agg(count(lit(1)).as("rows_before"))
        .crossJoin(broadcast(after.agg(count(lit(1)).as("rows_after"),
          count(when(col("user_id") % ForgetMod === ForgetRes, 1))
            .as("residual_refs"))))
        .select(lit(name).as("stage"), col("rows_before"), col("rows_after"),
          (col("rows_before") - col("rows_after")).as("removed"),
          col("residual_refs"),
          lit(null).cast("double").as("est_before"),
          lit(null).cast("double").as("est_after"))

    val evRow = stage("events", events, scrub)
    val seRow = stage("sessions",
      Sessions.sessionize(events), Sessions.sessionize(scrub))

    val key = concat(lit("hll|"), col("user_id").cast("string"))
    val duRow = events.agg(countDistinct(col("user_id")).as("rows_before"))
      .crossJoin(broadcast(scrub.agg(
        countDistinct(col("user_id")).as("rows_after"),
        countDistinct(when(fcond, col("user_id"))).as("residual_refs"))))
      .crossJoin(broadcast(Sketches.hllEstimateByGroup(events, Seq.empty, key)
        .select(col("hll_estimate").as("est_before"))))
      .crossJoin(broadcast(Sketches.hllEstimateByGroup(scrub, Seq.empty, key)
        .select(col("hll_estimate").as("est_after"))))
      .select(lit("distinct_users").as("stage"),
        col("rows_before"), col("rows_after"),
        (col("rows_before") - col("rows_after")).as("removed"),
        col("residual_refs"), col("est_before"), col("est_after"))

    evRow.unionByName(seRow).unionByName(duRow)
  }
}
