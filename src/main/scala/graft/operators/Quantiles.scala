package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact SQL quantile bucketing — `ntile` / `percent_rank` /
  * `cume_dist` — over an SF-SCALING dimension WITHOUT a
  * single-partition window (reference scope: the segmentation mart's
  * value-tier CASE ladder, `models/marts/customer_segmentation.sql`,
  * generalized to exact population quantiles; complements
  * [[graft.llm.Curriculum]]'s sketch-approximate quartiles with the
  * exact form).
  *
  * `NTILE(k) OVER (ORDER BY metric)` moves the whole input to one
  * task, exactly like the global-rank antipattern [[Ranks]] exists
  * for — so this composes [[Ranks.globalRank]] (two-phase
  * range-partitioned, ReusedExchange-deduplicated) and derives the
  * bucket/fraction columns as pure projections against the broadcast
  * one-row total:
  *
  *   bucket     = SQL ntile: the first n%k buckets get n div k + 1
  *                rows, the rest n div k — computed with INTEGER
  *                `div` arithmetic (ceil(a/b) = (a+b-1) div b), so
  *                boundaries cannot drift by a double ulp at any n;
  *   pct_rank   = (r-1)/(n-1)  (0.0 when n=1);
  *   cume_dist  = r/n.
  *
  * The unique-key tiebreak makes the total order strict (no ties), so
  * rank() = row_number() and the fraction formulas equal their SQL
  * window definitions bit-for-bit — the DuckDB oracle runs the real
  * window functions against the same order.
  */
object Quantiles {

  /** (key, value_rank, bucket, pct_rank, cume_dist), ordered by
    * `metric` DESC NULLS LAST with ascending `key` tiebreak (the
    * [[Ranks.globalRank]] convention). */
  def exactBuckets(df: DataFrame, key: String, metric: Column,
                   buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val ranked = Ranks.globalRank(df, key, metric, "value_rank")
    val total = ranked.agg(count(lit(1)).cast("long").as("__n"))
    ranked.crossJoin(broadcast(total))
      .withColumn("__r", col("value_rank").cast("long"))
      .withColumn("__q", expr(s"__n div $buckets"))
      .withColumn("__rem", expr(s"__n % $buckets"))
      .withColumn("__head", expr("__rem * (__q + 1)"))
      .withColumn("bucket",
        expr("case when __r <= __head then (__r + __q) div (__q + 1) " +
          "else __rem + (__r - __head + __q - 1) div __q end").cast("int"))
      .withColumn("pct_rank",
        expr("case when __n > 1 " +
          "then cast(__r - 1 as double) / cast(__n - 1 as double) " +
          "else 0.0 end"))
      .withColumn("cume_dist",
        expr("cast(__r as double) / cast(__n as double)"))
      .select(col(key), col("value_rank"), col("bucket"),
        col("pct_rank"), col("cume_dist"))
  }
}
