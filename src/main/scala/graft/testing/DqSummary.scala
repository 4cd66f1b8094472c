package graft.testing

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's declarative data-test suite (SURVEY §5.1 — the 25
  * generic instances [[ReferenceDataTestsSpec]] runs table-driven) as
  * ONE queryable audit table: (rule, table_name, target, n_failing),
  * one row per test instance, 0 = pass — dbt's `dbt test` results
  * relation, produced as a registered query so the DRIVER's
  * differential gate verifies the test layer itself.
  *
  * Both engines compile from the SAME rule lists below (the Funnel
  * .Stages pattern): the Spark side builds per-rule single-aggregation
  * plans; [[oracleSelects]] renders the equivalent DuckDB SQL. The
  * expression rules are shared as SQL strings parsed by BOTH engines'
  * parsers, so a rule cannot drift between them.
  *
  * Scale: every rule is one aggregation (uniqueness is the honest
  * key-shuffle; relationships is a left-anti join — the distributed
  * form of referential integrity); nothing collects, nothing is
  * pairwise. The marts under test are Mat barriers, so the audit reads
  * materialized parquet, not re-derived subtrees.
  */
object DqSummary {

  /** unique + not_null primary keys (stg_*.yml, <mart>.yml). */
  val primaryKeys: Seq[(String, String)] = Seq(
    "stg_customers" -> "customer_id",
    "stg_orders" -> "order_id",
    "stg_order_items" -> "order_item_id",
    "stg_products" -> "product_id",
    "stg_locations" -> "location_id",
    "stg_supplies" -> "supply_uuid",
    "orders" -> "order_id",
    "customers" -> "customer_id",
    "order_items" -> "order_item_id",
    "products" -> "product_id",
    "locations" -> "location_id",
    "supplies" -> "supply_uuid",
    "customer_segmentation" -> "customer_id",
    "time_analytics" -> "date_day")

  /** (childTable, childKey, parentTable, parentKey). */
  val relationshipRules: Seq[(String, String, String, String)] = Seq(
    ("orders", "customer_id", "stg_customers", "customer_id"),
    ("order_items", "order_id", "orders", "order_id"),
    ("stg_order_items", "order_id", "stg_orders", "order_id"))

  val acceptedValueRules: Seq[(String, String, Seq[String])] = Seq(
    ("customers", "customer_type", Seq("new", "returning")))

  /** (table, sql expression) — the invariant, in syntax BOTH parsers
    * accept; evaluated on the exact-decimal surface where a − b = c
    * holds bit-wise (the driver-facing double surface would not). */
  val expressionRules: Seq[(String, String)] = Seq(
    ("stg_orders", "order_total - tax_paid = subtotal"),
    ("orders", "order_total = subtotal + tax_paid"),
    ("customers", "lifetime_spend_pretax + lifetime_tax_paid = lifetime_spend"))

  /** (table, loadedAt column, max age days vs the pinned run date). */
  val freshnessRules: Seq[(String, String, Int)] = Seq(
    ("stg_orders", "ordered_at", 30))

  /** Spark side: `m` resolves a table name to its (decimal-surface)
    * DataFrame. One row per rule instance. */
  def summary(m: String => DataFrame): DataFrame = {
    def row(rule: String, table: String, target: String, n: DataFrame) =
      n.select(lit(rule).as("rule"), lit(table).as("table_name"),
        lit(target).as("target"), col("n_failing"))
    // not_null + unique share ONE key aggregation per table (half the
    // jobs of the naive two-subplans form — this query is 36 rules and
    // per-subplan fixed cost dominates it)
    val pk = primaryKeys.map { case (t, k) =>
      m(t).groupBy(col(k)).agg(count(lit(1)).as("cnt"))
        .agg(coalesce(sum(when(col(k).isNull, col("cnt"))), lit(0L)).as("n_null"),
          count(when(col("cnt") > 1, lit(1))).as("n_dup"))
        .select(explode(array(
          struct(lit("not_null").as("rule"), lit(t).as("table_name"),
            lit(k).as("target"), col("n_null").as("n_failing")),
          struct(lit("unique").as("rule"), lit(t).as("table_name"),
            lit(k).as("target"), col("n_dup").as("n_failing")))).as("r"))
        .select("r.*")
    }
    val rel = relationshipRules.map { case (ct, ck, pt, pk0) =>
      row("relationships", ct, s"$ck -> $pt.$pk0",
        m(ct).filter(col(ck).isNotNull)
          .join(m(pt).select(col(pk0).as(ck)).distinct(), Seq(ck), "left_anti")
          .agg(count(lit(1)).as("n_failing")))
    }
    val acc = acceptedValueRules.map { case (t, c, vals) =>
      row("accepted_values", t, c,
        m(t).agg(count(when(col(c).isNull || !col(c).isin(vals: _*), lit(1)))
          .as("n_failing")))
    }
    val ex = expressionRules.map { case (t, e) =>
      row("expression_is_true", t, e,
        m(t).agg(count(when(!coalesce(expr(e), lit(false)), lit(1))).as("n_failing")))
    }
    val fresh = freshnessRules.map { case (t, c, days) =>
      row("freshness", t, c,
        m(t).agg(max(col(c)).as("mx"))
          .select(when(col("mx").isNull ||
              datediff(graft.functions.Funcs.runDate, col("mx")) > days, lit(1L))
            .otherwise(lit(0L)).as("n_failing")))
    }
    (pk ++ rel ++ acc ++ ex ++ fresh).reduce(_ unionByName _)
  }

  /** DuckDB side: the same rules over the oracle CTEs. `cte` maps a
    * table name to its CTE name in the caller's WITH prefix. */
  def oracleSelects(cte: String => String): String = {
    val pk = primaryKeys.flatMap { case (t, k) =>
      val c = cte(t)
      Seq(
        s"select 'not_null' as rule, '$t' as table_name, '$k' as target, " +
          s"cast(count(case when $k is null then 1 end) as bigint) as n_failing from $c",
        s"select 'unique', '$t', '$k', cast(count(*) as bigint) " +
          s"from (select $k from $c group by 1 having count(*) > 1) u")
    }
    val rel = relationshipRules.map { case (ct, ck, pt, pk0) =>
      s"select 'relationships', '$ct', '$ck -> $pt.$pk0', cast(count(*) as bigint) " +
        s"from ${cte(ct)} c left join (select distinct $pk0 as __pk from ${cte(pt)}) p " +
        s"on c.$ck = p.__pk where c.$ck is not null and p.__pk is null"
    }
    val acc = acceptedValueRules.map { case (t, c, vals) =>
      val inList = vals.map(v => s"'$v'").mkString(", ")
      s"select 'accepted_values', '$t', '$c', " +
        s"cast(count(case when $c is null or $c not in ($inList) then 1 end) as bigint) " +
        s"from ${cte(t)}"
    }
    val ex = expressionRules.map { case (t, e) =>
      s"select 'expression_is_true', '$t', '${e.replace("'", "''")}', " +
        s"cast(count(case when not coalesce(($e), false) then 1 end) as bigint) from ${cte(t)}"
    }
    val fresh = freshnessRules.map { case (t, c, days) =>
      s"select 'freshness', '$t', '$c', cast(case when max($c) is null " +
        s"or date_diff('day', cast(max($c) as date), DATE '${graft.functions.Funcs.RunDate}') > $days " +
        s"then 1 else 0 end as bigint) from ${cte(t)}"
    }
    (pk ++ rel ++ acc ++ ex ++ fresh).mkString("\nunion all\n")
  }
}
