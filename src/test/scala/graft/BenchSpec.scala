package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench headline guard (VERDICT r7 #7): a pass that dies mid-run
  * must fail the artifact loudly, never shrink the min dict unnoticed. */
class BenchSpec extends AnyFunSuite {

  test("minResults takes the per-query min over aligned full passes") {
    val cold = Seq("a" -> 2.0, "b" -> 1.0)
    val warm = Seq("a" -> 1.5, "b" -> 3.0)
    val warm2 = Seq("a" -> 1.8, "b" -> 0.9)
    assert(Bench.minResults(Seq(cold, warm), 2) === Seq("a" -> 1.5, "b" -> 1.0))
    assert(Bench.minResults(Seq(cold, warm, warm2), 2) === Seq("a" -> 1.5, "b" -> 0.9))
  }

  test("a short pass fails the invariant") {
    val full = Seq("a" -> 1.0, "b" -> 1.0)
    val short = Seq("a" -> 1.0)
    intercept[IllegalArgumentException](Bench.minResults(Seq(short, full), 2))
    intercept[IllegalArgumentException](Bench.minResults(Seq(full, short), 2))
    intercept[IllegalArgumentException](Bench.minResults(Seq(full, full), 3))
    intercept[IllegalArgumentException](Bench.minResults(Seq.empty, 2))
  }

  test("misaligned query names fail the invariant") {
    intercept[IllegalArgumentException](
      Bench.minResults(Seq(Seq("a" -> 1.0, "b" -> 1.0), Seq("a" -> 1.0, "c" -> 1.0)), 2))
  }
}
