package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Output-boundary presentation (VERDICT r1 root cause).
  *
  * All money arithmetic is exact DecimalType internally — sums are
  * associative and partition-order independent. But the externally
  * visible result must hash identically to the DuckDB oracle, whose
  * client materializes decimals as float64. A decimal(18,2) and the
  * float64 it converts to stringify differently ("2547.40" vs
  * "2547.4"), so we cast every decimal column to double in the FINAL
  * projection only; both engines then hold bit-identical IEEE doubles
  * (decimal→double is a single correctly-rounded conversion on both).
  */
object Out {
  def presentDoubles(df: DataFrame): DataFrame = {
    val needs = df.schema.fields.exists(_.dataType.isInstanceOf[DecimalType])
    if (!needs) df
    else df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: DecimalType => col(f.name).cast(DoubleType).as(f.name)
        case _ => col(f.name)
      }
    }.toSeq: _*)
  }
}
