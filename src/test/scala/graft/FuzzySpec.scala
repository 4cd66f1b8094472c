package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Fuzzy

/** Blocked edit-distance nearest-name match ([[operators.Fuzzy]]):
  * argmin correctness, deterministic tiebreaks, block-cap and
  * singleton-block drop semantics. */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private val catalog = Seq(
    "red widget", "blue widget", "bright red widget", // block "widget"
    "small ring", "smell ring",                       // block "ring"
    "lone bolt"                                       // singleton block
  ).toDF("name")

  test("nearest match is the levenshtein argmin within the block") {
    val out = Fuzzy.nearestNameMatch(catalog, "name").collect()
      .map(r => r.getString(0) -> (r.getString(2), r.getLong(3))).toMap
    // "red widget" vs "blue widget" = 4 edits; vs "bright red widget" = 7
    assert(out("red widget") === ("blue widget", 4L))
    assert(out("small ring") === ("smell ring", 1L))
    assert(out("smell ring") === ("small ring", 1L))
  }

  test("singleton blocks produce no row; no cross-block candidates") {
    val out = Fuzzy.nearestNameMatch(catalog, "name")
    assert(!out.select("name").as[String].collect().contains("lone bolt"))
    // every match shares the block key with its name
    assert(out.filter(Fuzzy.blockKey(col("name")) =!=
      Fuzzy.blockKey(col("match_name"))).count() === 0)
  }

  test("blocks over the cap are dropped entirely") {
    val out = Fuzzy.nearestNameMatch(catalog, "name", cap = 2)
    // the 3-member "widget" block exceeds cap=2 → only the ring pair
    assert(out.select("block").distinct().as[String].collect().toSet === Set("ring"))
  }

  test("tiebreak: equal distances resolve by match_name ascending") {
    val tied = Seq("aa x", "ab x", "ac x").toDF("name")
    // "ab x" is distance 1 from both neighbours → picks "aa x" (asc)
    val m = Fuzzy.nearestNameMatch(tied, "name").collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(m("ab x") === "aa x")
  }

  test("similar pairs close transitively into entity clusters") {
    // chain: "aaaa x" ~ "aaab x" ~ "aabb x" (each 1 edit apart), while
    // "zzzz x" is isolated; cluster id is the lexicographic-min name.
    val names = Seq("aaaa x", "aaab x", "aabb x", "zzzz x").toDF("name")
    val edges = graft.operators.Fuzzy.similarPairs(names, "name", maxDist = 1)
    val clusters = graft.llm.Clusters.connectedComponents(edges).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(clusters.keySet === Set("aaaa x", "aaab x", "aabb x"))
    assert(clusters.values.toSet === Set(("aaaa x", 3L)))
  }

  test("matches the unblocked argmin when every name shares one block") {
    val names = Seq("kitten z", "sitting z", "mitten z", "bitten z").toDF("name")
    val out = Fuzzy.nearestNameMatch(names, "name").collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(3)))
    val all = names.as[String].collect()
    out.foreach { case (n, m, d) =>
      val best = all.filter(_ != n)
        .map(o => (StringUtilsLev.dist(n, o), o)).min
      assert((d, m) === best, s"for $n")
    }
  }
}

/** Reference Levenshtein for the spec (classic DP, unit costs). */
object StringUtilsLev {
  def dist(a: String, b: String): Long = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length).toLong
  }
}
