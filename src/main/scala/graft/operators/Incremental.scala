package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, date_trunc}
import org.apache.spark.sql.types.DateType

/** dbt `incremental` materialization for month-partitioned marts —
  * the insert_overwrite strategy (dbt-spark's recommended incremental
  * strategy for partitioned tables; reference dbt_project.yml uses
  * `table` everywhere, so this is the beyond-parity production path).
  *
  * At 100 TB a mart rebuild is the dominant nightly cost, but new facts
  * only land in recent months: recomputing ONLY the partitions the new
  * data touches turns an O(history) rebuild into O(recent). Mechanics:
  *
  *  1. the caller provides the recomputed rows for the affected window
  *     (typically `build.filter(timeKey >= watermark - lookback)` —
  *     the `is_incremental()` filter in dbt terms);
  *  2. rows are stamped with the same `__p_month` key, repartitioned
  *     one-file-per-month and sorted on the time key (identical layout
  *     to [[graft.Mat]] full builds, so row-group pruning and the
  *     MonthPruning rule keep working);
  *  3. a DYNAMIC partition overwrite (`partitionOverwriteMode=dynamic`)
  *     replaces exactly the partitions present in the new data and
  *     leaves every other month's files untouched.
  *
  * Correctness contract: the caller's window must cover whole months
  * (recompute every month it overwrites in full) — the overwrite is
  * per-partition, so a half-month recompute would drop the other half.
  */
object Incremental {

  private val confLock = new Object

  /** Overwrite only the `__p_month` partitions present in `newRows`.
    * `newRows` must have the table's data-column order (partition
    * column is appended last here, matching the catalog schema that
    * `saveAsTable(partitionBy)` wrote — `insertInto` resolves columns
    * by POSITION). */
  def overwriteMonths(spark: SparkSession, table: String, timeKey: String,
                      newRows: DataFrame): Unit =
    // the session conf, not a writer option: insertInto's V1 command
    // reads spark.sql.sources.partitionOverwriteMode (a writer option
    // is silently ignored here and would STATIC-overwrite the whole
    // table, dropping history); restore the caller's setting after.
    // The set/write/restore is serialized under a JVM-wide lock —
    // interleaved toggles from concurrent calls could otherwise leave
    // a call running in static mode (= drop history). Writers OUTSIDE
    // this object that race the same session conf are the caller's
    // responsibility — or switch Mat to a table format with per-write
    // overwrite semantics (see README "Table format status").
    confLock.synchronized {
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "dynamic")
      try newRows
        .withColumn("__p_month", date_trunc("month", col(timeKey)).cast(DateType))
        .repartition(col("__p_month"))
        .sortWithinPartitions(col(timeKey))
        .write
        .mode(SaveMode.Overwrite)
        .insertInto(table)
      finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
}
