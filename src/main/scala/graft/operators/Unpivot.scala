package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wide→long reshape (melt / UNPIVOT) — the inverse of the pivot
  * already in the relational surface (reference scope: the marts are
  * all wide per-entity metric tables, e.g. `models/marts/
  * time_analytics.sql`'s daily block; a metrics consumer reads them
  * long, one (entity, metric, value) row per cell).
  *
  * Spark-first: `Dataset.unpivot` compiles to a single `Expand` node —
  * ONE scan of the input emitting n_metrics rows per input row — not
  * the n_metrics-scan UNION ALL a naive melt would run (the DuckDB
  * oracle mirrors the UNION ALL form, which is semantically identical
  * and fine at oracle scale). No shuffle at all: Expand is narrow, so
  * at 100 TB the reshape rides whatever partitioning the input
  * already has and the output is `n_metrics×` rows of three narrow
  * columns, smaller than the wide row it came from whenever the
  * consumer prunes to a metric subset.
  *
  * Every value column is cast to double AT the reshape boundary (the
  * long form needs one value type): exact decimal/long → IEEE double
  * is deterministic and identical in DuckDB, and the wide table stays
  * exact for every other consumer.
  */
object Unpivot {

  /** (ids..., metric, value): one row per (input row, value column),
    * value cast to double, metric = source column name. Value rows
    * keep nulls (a null cell is a fact, not an absent row). */
  def melt(df: DataFrame, ids: Seq[String], values: Seq[String]): DataFrame =
    df.unpivot(
      ids.map(col).toArray,
      values.map(c => col(c).cast("double").as(c)).toArray,
      "metric", "value")
}
