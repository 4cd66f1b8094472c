package graft

import org.apache.spark.sql.functions._
import graft.expressions.TextExprs

/** The native md5_prefix60 must be bit-identical to the composed
  * built-in form it replaces — the DuckDB oracle depends on it.
  */
class Md5Prefix60Spec extends SparkSpec {

  test("md5_prefix60 == conv(substring(md5,1,15),16,10) on arbitrary strings") {
    import spark.implicits._
    val samples = Seq(
      "", "a", "0|the quick brown fox", "15|shingle with spaces",
      "unicode: München Ωméga 日本語 🦀", "\ttabs\nand\rnewlines",
      "x" * 10000) ++ (0 until 1000).map(i => s"doc $i body ${i * 2654435761L}")
    val df = samples.toDF("s")
    val bad = df.select(
        TextExprs.md5_prefix60(col("s")).as("fast"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(bad === 0)
    // null propagates
    assert(Seq[Option[String]](None).toDF("s")
      .select(TextExprs.md5_prefix60(col("s"))).head.isNullAt(0))
  }

  test("md5_hex == built-in md5() byte-for-byte on arbitrary strings") {
    import spark.implicits._
    val samples = Seq(
      "", "a", "1-2-3-1995-01-01", "_dbt_utils_surrogate_key_null_",
      "unicode: München Ωméga 日本語 🦀", "\ttabs\nand\rnewlines",
      "x" * 10000) ++ (0 until 1000).map(i => s"$i-${i * 31}-${i % 7}")
    val df = samples.toDF("s")
    val bad = df.select(
        TextExprs.md5_hex(col("s")).as("fast"), md5(col("s")).as("builtin"))
      .filter(col("fast") =!= col("builtin")).count()
    assert(bad === 0)
    assert(Seq[Option[String]](None).toDF("s")
      .select(TextExprs.md5_hex(col("s"))).head.isNullAt(0))
  }

  test("md5_prefix60 rejects non-string input") {
    import spark.implicits._
    intercept[Exception] {
      Seq(1L).toDF("x").select(TextExprs.md5_prefix60(col("x"))).collect()
    }
  }
}
