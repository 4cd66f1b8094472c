package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DateType}

/** Scalar-function surface of the reference (SURVEY.md §2.7), re-expressed
  * as compositions of codegen'd Catalyst built-ins — no UDFs anywhere, so
  * every expression stays inside whole-stage codegen.
  *
  * Cross-engine determinism rules (the DuckDB oracle must hash-match):
  *  - money flows through DecimalType(18,2): decimal sums are exact and
  *    associative, immune to partition-order FP differences.
  *  - ratios are a single IEEE division of exactly-reproducible inputs →
  *    bit-identical doubles on both engines.
  *  - variance/stddev use the exact sum-of-squares decimal formula rather
  *    than the engines' (merge-order-dependent) streaming aggregates.
  */
object Funcs {

  /** Fixed evaluation clock replacing `current_date` (reference
    * `models/marts/customer_segmentation.sql:32`, `time_analytics.sql:175`)
    * — SURVEY §7.4.4: deterministic runs need an injected run date.
    * Data spans 1995-01-01 .. 2001-11-04, so "today" is pinned just after.
    */
  val RunDate = "2001-12-31"
  def runDate: Column = to_date(lit(RunDate))

  /** `cents_to_dollars` macro (reference `macros/cents_to_dollars.sql:7-9`):
    * `(c / 100)::numeric(16,2)`.
    */
  def centsToDollars(cents: Column): Column =
    (cents / lit(100)).cast(DecimalType(16, 2))

  /** Money canonicalization: every currency column is decimal(18,2). */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Scale-4 money for discount-derived values: decimal(18,2) × decimal
    * rate is exact at scale 4, so no rounding step exists where Spark
    * (HALF_UP) and DuckDB (half-even on doubles) could diverge. */
  def money4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** `dbt_utils.generate_surrogate_key` (public dbt_utils 1.1.1 semantics,
    * reference `models/staging/stg_supplies.sql:14`): md5 of '-'-joined
    * null-coalesced string casts.
    */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("-", cols.map(c =>
      coalesce(c.cast("string"), lit("_dbt_utils_surrogate_key_null_"))): _*))

  /** `datediff('month', a, b)` with month-*boundary* counting (reference
    * `models/marts/time_analytics.sql:99`) — NOT Spark's fractional
    * `months_between`; SURVEY §7.4.6.
    */
  def monthsBetweenBoundary(a: Column, b: Column): Column =
    (year(b) * 12 + month(b)) - (year(a) * 12 + month(a))

  /** Guarded division (reference's `case when d > 0 then n/d else 0 end`
    * pattern, e.g. `models/marts/products.sql:38-42`). Single IEEE double
    * division → deterministic across engines.
    */
  def safeDiv(n: Column, d: Column): Column =
    when(d =!= 0, n.cast("double") / d.cast("double")).otherwise(lit(0.0))

  /** Day truncation used by staging (reference
    * `models/staging/stg_orders.sql:27`). */
  def toDay(ts: Column): Column = ts.cast(DateType)

  /** Sample-stddev from exact decimal sums: sqrt((Σx² − (Σx)²/n) / (n−1)).
    * Callers aggregate sum(x), sum(x·x), count first (exact decimals),
    * then apply this scalar — identical double math on both engines
    * (reference `models/marts/locations.sql:101-118` uses `stddev`).
    */
  def stddevFromSums(sumX: Column, sumX2: Column, n: Column): Column =
    when(n > 1,
      sqrt((sumX2.cast("double") - sumX.cast("double") * sumX.cast("double") / n.cast("double"))
        / (n.cast("double") - lit(1.0))))
      .otherwise(lit(null).cast("double"))
}
