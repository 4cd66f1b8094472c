package graft

import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Value-level specs for the scalar-function surface (SURVEY §2.7) —
  * including the helpers no registered query exercises directly
  * (centsToDollars, safeDiv), per ADVICE r1.
  */
class FuncsSpec extends SparkSpec {

  import spark.implicits._

  test("F1 centsToDollars: (c/100)::numeric(16,2) with HALF_UP") {
    val out = Seq(1100L, 1, 50, 149, 151).toDF("c")
      .select(Funcs.centsToDollars(col("c")).cast("string")).as[String].collect()
    assert(out === Array("11.00", "0.01", "0.50", "1.49", "1.51"))
  }

  test("safeDiv: guarded double division, 0 on zero denominator") {
    val out = Seq((10.0, 4.0), (1.0, 0.0)).toDF("n", "d")
      .select(Funcs.safeDiv(col("n"), col("d"))).as[Double].collect()
    assert(out === Array(2.5, 0.0))
  }

  test("F3 monthsBetweenBoundary counts month boundaries, not fractions") {
    val out = Seq(("2001-01-31", "2001-02-01"), ("2001-01-01", "2001-12-31"))
      .toDF("a", "b")
      .select(Funcs.monthsBetweenBoundary(to_date(col("a")), to_date(col("b"))))
      .as[Int].collect()
    assert(out === Array(1, 11))
  }

  test("F8 surrogateKey matches the dbt_utils md5 recipe incl. null marker") {
    val row = Seq((java.lang.Long.valueOf(7L), "x")).toDF("a", "b")
    val got = row.select(Funcs.surrogateKey(col("a"), col("b"))).as[String].head
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("7-x".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got === expected)
    val gotNull = row.select(Funcs.surrogateKey(lit(null).cast("string"), col("b")))
      .as[String].head
    val expNull = java.security.MessageDigest.getInstance("MD5")
      .digest("_dbt_utils_surrogate_key_null_-x".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(gotNull === expNull)
  }

  test("stddevFromSums equals Spark's stddev_samp on clean doubles") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 10.0).toDF("x")
    val viaSums = df.agg(Funcs.stddevFromSums(
      sum(col("x")), sum(col("x") * col("x")), count(col("x")))).as[Double].head
    val native = df.agg(stddev_samp(col("x"))).as[Double].head
    assert(math.abs(viaSums - native) < 1e-9)
  }

  test("embedding near-dup pairs: ordered, thresholded, symmetric-free") {
    val p = Models.embeddingDedupPairs(spark, sf)
    assert(p.filter(col("vec_a") >= col("vec_b")).count() === 0)
    assert(p.filter(col("cosine") < llm.Similarity.NearDupCosine).count() === 0)
  }

  test("ann ivf: probes stay within IvfNProbe inverted lists per query; ranks dense") {
    val t = Models.annIvfTopK(spark, sf)
    // neighbors come only from the query's probed centroid lists
    assert(t.groupBy("query_id")
      .agg(countDistinct("centroid_id").as("n"))
      .filter(col("n") > llm.Similarity.IvfNProbe).count() === 0)
    val perQuery = t.groupBy("query_id").agg(min("rank").as("mn"), max("rank").as("mx"))
    assert(perQuery.filter(col("mn") =!= 1).count() === 0)
    assert(t.filter(col("query_id") === col("neighbor_id")).count() === 0)
    // multi-probe can only ADD candidates: top-k cosines must dominate
    // (pairwise >=) the single-list variant's for every query — proven
    // indirectly by rank density + the oracle gate; here pin that at
    // least one query actually uses a second list at this SF (the
    // boundary-recall case the multi-probe exists for)
    assert(t.groupBy("query_id")
      .agg(countDistinct("centroid_id").as("n")).filter(col("n") === 2).count() > 0)
  }

  test("date_trunc week starts Monday across year boundaries (oracle-equivalent)") {
    // SURVEY §7.4.2: Spark date_trunc('week') and DuckDB date_trunc
    // ('week') must agree on Monday week starts — pinned on dates whose
    // ISO week belongs to the NEIGHBORING year
    val cases = Seq(
      ("2021-01-01", "2020-12-28"), // Fri → prev-year Monday
      ("2017-01-01", "2016-12-26"), // Sun → prev-year Monday
      ("2018-12-31", "2018-12-31"), // Mon → itself (week of next year)
      ("2020-02-29", "2020-02-24"), // leap day
      ("2019-01-06", "2018-12-31")) // Sun of the year's first ISO week
    val df = cases.toDF("d", "expected")
      .select(col("expected").cast("date").as("expected"),
        date_trunc("week", col("d").cast("date")).cast("date").as("got"))
    assert(df.filter(col("got") =!= col("expected")).count() === 0)
    // and every truncated value is a Monday (Spark dayofweek: 2=Monday)
    assert(df.filter(dayofweek(col("got")) =!= 2).count() === 0)
  }
}
