package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
