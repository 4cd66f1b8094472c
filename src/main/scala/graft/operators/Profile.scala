package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Column-level data profiling — the dbt-docs/dq-audit "profile"
  * surface: per column, row count, null count, and exact distinct
  * count, computed in ONE aggregation pass over the input (no
  * per-column scans). Output is long format (column_name, n_rows,
  * n_nulls, n_distinct) — the shape a catalog UI or a contract
  * checker consumes.
  *
  * Scale: the single pass costs one shuffle, but N exact distincts in
  * one aggregate plan through a ×(N+1) Expand of the input — exact
  * profiling is for mart/audit grain (what this registers). At corpus
  * grain swap the distinct aggregates for approx_count_distinct or
  * the mergeable HLL in [[Sketches]] — same output shape, one pass,
  * no Expand. The final melt is a union of one-row projections off
  * the single aggregated row — bounded by the schema, free.
  */
object Profile {

  /** Exact profile of `cols` (all must exist in `df`). The melt is an
    * explode of per-column structs off the ONE aggregated row — a
    * single plan branch, so the aggregation executes once (a union of
    * per-column projections would re-run the final aggregate per
    * branch). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c"))) :+ count(lit(1)).as("n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(cols.map(c => struct(
        lit(c).as("column_name"),
        col("n").as("n_rows"),
        (col("n") - col(s"nn_$c")).as("n_nulls"),
        col(s"nd_$c").as("n_distinct"))): _*)).as("p"))
      .select(col("p.column_name"), col("p.n_rows"),
        col("p.n_nulls"), col("p.n_distinct"))
  }

  /** CORPUS-grain profile — the HLL swap the exact profiler's scaladoc
    * promises: same long output shape, but n_distinct is the
    * [[Sketches]] estimate, so there is NO Expand and the shuffle
    * carries per-column counters plus ≤ m register rows per column
    * instead of every distinct value. One scan melts the columns to
    * (column_name, value) — partial aggregation reduces it map-side —
    * and the null/row counters ride the same melted relation.
    * Output: (column_name, n_rows, n_nulls, n_distinct_est). */
  def profileApprox(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileApprox needs at least one column")
    val melted = df.select(explode(array(cols.map(c => struct(
        lit(c).as("column_name"),
        col(c).cast(StringType).as("value"))): _*)).as("p"))
      .select(col("p.column_name"), col("p.value"))
    val counts = melted.groupBy("column_name").agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count(col("value"))).as("n_nulls"))
    val est = Sketches.hllEstimateByGroup(
      melted.filter(col("value").isNotNull),
      Seq("column_name"), concat(lit("hll|"), col("value")))
    // left join + coalesce: an all-null column builds no registers but
    // still profiles (0 distinct)
    counts.join(est, Seq("column_name"), "left")
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        coalesce(col("hll_estimate"), lit(0.0)).as("n_distinct_est"))
  }
}
