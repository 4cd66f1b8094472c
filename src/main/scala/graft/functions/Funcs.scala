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
    * Testdata orders span 1995-01-01 .. 2001-08-01; "today" is pinned two
    * weeks after the last order so RFM recency buckets (30/60/90/180d,
    * `customer_segmentation.sql:36-42`) are all populated.
    */
  val RunDate = "2001-08-15"
  def runDate: Column = to_date(lit(RunDate))

  /** `cents_to_dollars` macro (reference `macros/cents_to_dollars.sql:7-9`):
    * `(c / 100)::numeric(16,2)`.
    */
  def centsToDollars(cents: Column): Column =
    (cents / lit(100)).cast(DecimalType(16, 2))

  /** Money canonicalization: every currency column is decimal(18,2). */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal(18,2) / (18,4) casts for aggregate results. */
  def dec18(c: Column): Column = c.cast(DecimalType(18, 2))
  def dec184(c: Column): Column = c.cast(DecimalType(18, 4))

  /** sum(x)/count guarded average as a single IEEE double division of
    * exact decimal/long inputs — replaces engine-native `avg`, whose
    * decimal handling differs between Spark (decimal out, HALF_UP) and
    * DuckDB (double out). Oracle SQL mirrors the same sum/count form. */
  def avgOf(sumC: Column, cnt: Column): Column =
    when(cnt > 0, sumC.cast("double") / cnt.cast("double"))

  /** Scale-4 money for discount-derived values: decimal(18,2) × decimal
    * rate is exact at scale 4, so no rounding step exists where Spark
    * (HALF_UP) and DuckDB (half-even on doubles) could diverge. */
  def money4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** `dbt_utils.generate_surrogate_key` (public dbt_utils 1.1.1 semantics,
    * reference `models/staging/stg_supplies.sql:14`): md5 of '-'-joined
    * null-coalesced string casts.
    */
  def surrogateKey(cols: Column*): Column =
    // native md5-hex (r18): byte-identical to built-in md5(), without
    // the per-row MessageDigest + char[]→String allocations — measured
    // ~half of stg_order_items' execution at sf0.1.
    graft.expressions.TextExprs.md5_hex(concat_ws("-", cols.map(c =>
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
  def stddevFromSums(sumX: Column, sumX2: Column, n: Column): Column = {
    // Σx² at scale 4 can exceed 2^53 in unscaled units; direct
    // decimal→double then differs between engines in the last ulp
    // (int128→double→÷10^scale double-rounds). decimal→string→double is
    // exact-then-correctly-rounded on BOTH engines (Double.parseDouble /
    // strtod), so the converted values are bit-identical.
    val sx = sumX.cast("string").cast("double")
    val sx2 = sumX2.cast("string").cast("double")
    val nd = n.cast("double")
    when(n > 1, sqrt((sx2 - sx * sx / nd) / (nd - lit(1.0))))
      .otherwise(lit(null).cast("double"))
  }
}
