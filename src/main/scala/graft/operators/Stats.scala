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
