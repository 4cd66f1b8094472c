package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: a new query registered WITHOUT an oracle
  * silently downgrades the driver's correctness gate for it to
  * rows-only — the strongest check in the project becomes the weakest
  * without anyone noticing. Pin the key sets equal so an omission is a
  * deliberate, reviewed act (delete the assertion entry), never an
  * accident. */
class ContractSpec extends AnyFunSuite {

  test("every registered query has a DuckDB oracle, and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("no oracle SQL interpolated a null (object val declaration order)") {
    // a val referencing a LATER-declared val in the oracle objects
    // interpolates the string "null" into the SQL at object init —
    // DuckDB then fails with a confusing parse error at driver time.
    // An interpolated null lands as "with null" or after a CTE comma;
    // legitimate SQL ("is null", "nulls last") matches neither shape.
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql != null && sql.trim.nonEmpty, s"$name: empty oracle")
      assert(!sql.contains("with null") && !sql.contains(",\nnull"),
        s"$name: oracle SQL contains an interpolated null — check val declaration order")
    }
  }
}
