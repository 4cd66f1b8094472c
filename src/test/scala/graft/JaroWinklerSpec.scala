package graft

import org.apache.spark.sql.functions.col
import graft.expressions.StringSim

/** StringSim.JaroWinkler: textbook vectors bit-exact against the
  * DuckDB reference values (probed from jaro_winkler_similarity — the
  * oracle this expression is pinned to), the 0.7 boost threshold, and
  * the codegen path agreeing with eval. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    StringSim.jaroWinkler(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("textbook vectors match the DuckDB reference bits") {
    // right-hand sides printed by DuckDB jaro_winkler_similarity
    assert(jw("martha", "marhta") === 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") === 0.8962962962962964)
    assert(jw("DWAYNE", "DUANE") === 0.8400000000000001)
    assert(jw("kitten", "sitting") === 0.746031746031746)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("abc", "") === 0.0)
    assert(jw("a", "b") === 0.0)
  }

  test("non-ASCII compares UTF-8 BYTES, matching DuckDB (r15 advisory)") {
    // DuckDB 1.x jaro_winkler_similarity('café','cafe') = 0.8483… — it
    // walks UTF-8 bytes, so 'é' is TWO unmatched bytes (|a|=5, not 4).
    // The char-level reading would give 0.8833… and silently break the
    // bit-for-bit oracle contract on any non-ASCII name.
    val j = (3.0 / 5 + 3.0 / 4 + 1.0) / 3.0 // m=3 of byte-lengths 5,4; t=0
    val expected = j + 3 * 0.1 * (1.0 - j)  // prefix 'caf' = 3 bytes
    assert(jw("café", "cafe") === expected)
    assert(math.abs(jw("café", "cafe") - 0.8483333333333334) < 1e-12)
    assert(jw("café", "cafe") < 0.85) // char-level 0.8833 would fail here
    // two-byte chars that differ still never match mixed byte offsets
    assert(jw("café", "café") === 1.0)
  }

  test("winkler boost only above the 0.7 jaro threshold") {
    // shared prefix but jaro <= 0.7: NO boost (DuckDB-probed semantics)
    assert(jw("abqqqqqqqq", "abzzzzzzzz") === 0.4666666666666666)
    // jaro just above 0.7 with prefix 2: boosted
    assert(jw("ab", "abzzzzzzzzzz") === 0.7777777777777779)
  }

  test("symmetry and prefix cap at 4") {
    val pairs = Seq(("prefixes", "prefixed"), ("aaaaaX", "aaaaaY"))
    pairs.foreach { case (a, b) => assert(jw(a, b) === jw(b, a)) }
    // prefix 5 shared, but only 4 count toward the boost:
    // j = (5/6 + 5/6 + 5/5)/3; jw = j + 4*0.1*(1-j)
    val j = (5.0 / 6 + 5.0 / 6 + 1.0) / 3.0
    assert(jw("aaaaaX", "aaaaaY") === j + 4 * 0.1 * (1.0 - j))
  }

  test("dataframe column path (codegen) agrees with direct eval") {
    val df = Seq(("martha", "marhta"), ("DWAYNE", "DUANE"), ("", ""))
      .toDF("a", "b")
      .select(StringSim.jaro_winkler(col("a"), col("b")).as("jw"))
    assert(df.as[Double].collect().toSeq ===
      Seq(jw("martha", "marhta"), jw("DWAYNE", "DUANE"), 0.0))
  }
}
