package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the holdout assignment every
  * training-data pipeline needs before anything is trained.
  *
  * Assignment is a pure function of the stable document id (a salted
  * 60-bit md5 bucket in 0..99), so it is:
  *  - reproducible across runs, engines, and cluster sizes (no RNG, no
  *    partition dependence — the property `sample()` does NOT give);
  *  - stable under corpus growth: adding documents never moves an
  *    existing document between splits (the classic leakage bug with
  *    `row_number % 100` schemes, where one insertion reshuffles every
  *    split downstream);
  *  - exactly mirrorable in SQL for the oracle gate.
  *
  * At 100 TB: a projection — no shuffle, no state; the salt keeps the
  * split uncorrelated with any other hash-derived bucketing in the
  * pipeline (dedup bands, LSH buckets) built on the same md5 primitive.
  */
object Splits {

  val TrainPct = 90
  val ValidationPct = 5 // test = remainder

  val Salt = "split|"

  /** 0..99 split bucket for an id column. */
  def bucket(id: Column): Column =
    pmod(Dedup.hex60(concat(lit(Salt), id.cast("string"))), lit(100L))

  /** (doc_id, bucket, split) with train/validation/test labels. */
  def assign(documents: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val b = bucket(col(idCol))
    documents.select(
      col(idCol),
      b.as("bucket"),
      when(b < TrainPct, lit("train"))
        .when(b < TrainPct + ValidationPct, lit("validation"))
        .otherwise(lit("test")).as("split"))
  }
}
