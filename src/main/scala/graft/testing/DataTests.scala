package graft.testing

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic data-test library (SURVEY §5.1): each test returns the
  * FAILING-row count (0 = pass), exactly like dbt's generic tests
  * compile to `select count(*) from (<failing rows>)` (reference
  * `models/**/*.yml`: 25 instances of not_null/unique/relationships/
  * accepted_values + dbt_utils.expression_is_true).
  *
  * All tests are single aggregations over the tested frame — they scale
  * to any input size (no collect, no cross joins; `relationships` is a
  * left-anti join, the distributed form of referential integrity).
  */
object DataTests {

  /** `not_null` (e.g. reference `orders.yml:14-16`). */
  def notNull(df: DataFrame, column: String): Long =
    df.filter(col(column).isNull).count()

  /** `unique` (e.g. reference `customers.yml:11-13`). */
  def unique(df: DataFrame, column: String): Long =
    df.groupBy(column).count().filter(col("count") > 1).count()

  /** `relationships` — every child key exists in the parent (reference
    * `orders.yml:20-23`): failing rows = left-anti join, empty on pass. */
  def relationships(child: DataFrame, childKey: String,
                    parent: DataFrame, parentKey: String): Long =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .count()

  /** `accepted_values` (reference `customers.yml:31-33`). */
  def acceptedValues(df: DataFrame, column: String, values: Seq[Any]): Long =
    df.filter(!col(column).isin(values: _*) || col(column).isNull).count()

  /** `dbt_utils.expression_is_true` (reference `stg_orders.yml:4-7`,
    * `orders.yml:4-10`, `customers.yml:4-7`). */
  def expressionIsTrue(df: DataFrame, expr: Column): Long =
    df.filter(!coalesce(expr, lit(false))).count()

  /** Source freshness (reference `__sources.yml:12-13,17-18`):
    * max(loadedAt) must be within `maxAgeDays` of the run date. Returns
    * 0 on pass, 1 on stale/empty. */
  def freshness(df: DataFrame, loadedAt: String, runDate: Column, maxAgeDays: Int): Long = {
    val mx = df.agg(max(col(loadedAt)).as("mx"))
      .select(datediff(runDate, col("mx")).as("age"))
    mx.filter(col("age").isNull || col("age") > maxAgeDays).count()
  }
}
