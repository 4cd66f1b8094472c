package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Quantiles

/** Quantiles.exactBuckets must be byte-identical to the
  * single-partition window form — ntile's uneven bucket boundaries
  * (first n%k buckets one row fatter) are the part a hand-rolled
  * formula usually gets wrong, so sizes straddling several remainder
  * cases are exercised, plus metric ties (the unique key tiebreak
  * makes rank = row_number, which the fraction formulas rely on). */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("exactBuckets == window ntile/percent_rank/cume_dist across remainder cases") {
    for (n <- Seq(1, 2, 9, 10, 11, 25, 97, 100)) {
      // (i * 37) % 19 collides freely → duplicate metric values with
      // distinct keys exercise the tiebreak
      val df = (1 to n).map(i => (i.toLong, (i * 37 % 19).toDouble))
        .toDF("k", "m")
      val got = Quantiles.exactBuckets(df, "k", col("m"), 10)
        .orderBy("k").collect().toSeq
      val w = Window.orderBy(col("m").desc_nulls_last, col("k"))
      val want = df.select(col("k"),
          row_number().over(w).as("value_rank"),
          ntile(10).over(w).as("bucket"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume_dist"))
        .orderBy("k").collect().toSeq
      assert(got === want, s"n=$n diverged from the window form")
    }
  }

  test("buckets < rows: every bucket occupied and ordered") {
    val df = (1 to 40).map(i => (i.toLong, i.toDouble)).toDF("k", "m")
    val rows = Quantiles.exactBuckets(df, "k", col("m"), 4)
      .orderBy("value_rank").collect()
    assert(rows.map(_.getInt(2)).distinct.toSeq === Seq(1, 2, 3, 4))
    // bucket is monotone in rank
    assert(rows.map(_.getInt(2)).toSeq === rows.map(_.getInt(2)).sorted.toSeq)
  }
}
