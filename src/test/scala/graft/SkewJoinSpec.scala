package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** SkewJoin.salted must be row-for-row equal to the plain join under
  * heavy key skew, for inner and left joins, including build-side
  * duplicates (fan-out) and probe rows with no match.
  */
class SkewJoinSpec extends SparkSpec {

  private def skewed() = {
    // 20k rows, half of them on the single hot key 0
    val probe = spark.range(20000).select(
      col("id"),
      when(col("id") % 2 === 0, lit(0L)).otherwise(col("id") % 97).as("k"))
    // build: two rows per key (fan-out) over keys 0..49 — keys 50..96
    // are probe-side misses
    val build = spark.range(50).select(col("id").as("k"))
      .withColumn("tag", explode(array(lit("x"), lit("y"))))
    (probe, build)
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(df.columns.sorted.map(col): _*)

  test("salted inner join equals plain inner join under skew") {
    val (probe, build) = skewed()
    val plain = canon(probe.join(build, Seq("k"), "inner"))
    val salt = canon(SkewJoin.salted(probe, build, "k", col("id"), salts = 8))
    assert(salt.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salt).count() === 0)
  }

  test("salted left join preserves unmatched probe rows exactly once") {
    val (probe, build) = skewed()
    val plain = canon(probe.join(build, Seq("k"), "left"))
    val salt = canon(SkewJoin.salted(probe, build, "k", col("id"), salts = 8, joinType = "left"))
    assert(salt.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salt).count() === 0)
  }

  test("salt spreads the hot key across partitions") {
    val (probe, _) = skewed()
    val salted = probe.withColumn("__salt", pmod(xxhash64(col("id")), lit(8)))
    val spread = salted.filter(col("k") === 0)
      .groupBy("__salt").count().count()
    assert(spread === 8)
  }

  test("shared non-key column names are rejected up front") {
    // ADVICE r3 #4: without the guard this fails later, at analysis,
    // with an ambiguous-reference error from the final select
    val (probe, build) = skewed()
    val clash = build.withColumnRenamed(build.columns.filterNot(_ == "k").head, "id")
    val e = intercept[IllegalArgumentException] {
      SkewJoin.salted(probe, clash, "k", col("id"))
    }
    assert(e.getMessage.contains("disjoint non-key columns"))
  }
}
