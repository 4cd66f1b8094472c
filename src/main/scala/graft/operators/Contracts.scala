package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** dbt model contracts (`contract: enforced`): a materialization
  * declares its exact output schema and per-column NOT NULL
  * constraints, and the build FAILS before publishing anything that
  * deviates — the consumer-facing schema becomes an enforced API, not
  * an emergent property of the last refactor.
  *
  * Schema enforcement is a plan-time check (names + types, exact
  * set). Null constraints are enforced IN the write pass itself: each
  * constrained column is routed through `assert_true`, so violations
  * kill the job on the first offending row with a named-column error
  * — no second validation scan over the data, which is the difference
  * between "free" and "another full pass" at 100 TB.
  */
object Contracts {

  /** Validate `df` against `contract`; returns the df with null
    * checks woven in. Throws IllegalArgumentException on any
    * missing/extra/mistyped column; the returned plan throws at
    * execution on the first null in a non-nullable column. */
  def enforce(df: DataFrame, contract: StructType, table: String): DataFrame = {
    val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val expected = contract.fields.map(f => f.name -> f.dataType).toMap
    val missing = expected.keySet -- actual.keySet
    val extra = actual.keySet -- expected.keySet
    val mistyped = expected.keySet.intersect(actual.keySet)
      .filter(n => actual(n) != expected(n))
      .map(n => s"$n: declared ${expected(n).sql}, built ${actual(n).sql}")
    require(missing.isEmpty && extra.isEmpty && mistyped.isEmpty,
      s"contract violation for $table — " +
        (if (missing.nonEmpty) s"missing: ${missing.mkString(", ")}; " else "") +
        (if (extra.nonEmpty) s"undeclared: ${extra.mkString(", ")}; " else "") +
        (if (mistyped.nonEmpty) s"mistyped: ${mistyped.mkString("; ")}" else ""))
    val constrained = contract.fields.filterNot(_.nullable).map(_.name).toSet
    df.select(contract.fields.map { f =>
      if (constrained.contains(f.name))
        // assert_true returns null on success; the when() routes the
        // original value through, keeping the check un-prunable (it
        // feeds the output column itself)
        when(assert_true(col(f.name).isNotNull,
          lit(s"contract violation for $table: ${f.name} is NOT NULL")).isNull,
          col(f.name)).as(f.name)
      else col(f.name)
    }.toSeq: _*)
  }
}
