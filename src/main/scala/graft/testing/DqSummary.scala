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
    * DataFrame. One row per rule instance.
    *
    * EVERY rule on a table rides that table's single key aggregation
    * (VERDICT r6 #4 — per-subplan fixed cost dominates this query, so
    * the job count IS the cost): row-level counters (expression,
    * accepted_values) sum per key group then globally, freshness
    * maxes through both levels, and not_null/unique read the group
    * counts — one scan and one shuffle per table, 14 table subplans +
    * 3 relationship anti-joins instead of 22 subplans. Every
    * expression/accepted/freshness table has a primary-key rule, so
    * no separate plain-agg path is needed (asserted). */
  def summary(m: String => DataFrame): DataFrame = {
    def row(rule: String, table: String, target: String, n: DataFrame) =
      n.select(lit(rule).as("rule"), lit(table).as("table_name"),
        lit(target).as("target"), col("n_failing"))
    val exByT = expressionRules.groupBy(_._1)
    val accByT = acceptedValueRules.groupBy(_._1)
    val freshByT = freshnessRules.groupBy(_._1)
    val pkTables = primaryKeys.map(_._1).toSet
    require((exByT.keySet ++ accByT.keySet ++ freshByT.keySet).subsetOf(pkTables),
      "a non-key rule's table has no primary-key rule to fuse into")
    val perTable = primaryKeys.map { case (t, k) =>
      val ex = exByT.getOrElse(t, Nil)
      val acc = accByT.getOrElse(t, Nil)
      val fresh = freshByT.getOrElse(t, Nil)
      // level 1: per-key partials (count for not_null/unique, failing-
      // row counters for expression/accepted, max for freshness)
      val partials =
        count(lit(1)).as("cnt") +:
        (ex.zipWithIndex.map { case ((_, e), i) =>
          count(when(!coalesce(expr(e), lit(false)), lit(1))).as(s"ex$i") } ++
         acc.zipWithIndex.map { case ((_, c, vals), i) =>
          count(when(col(c).isNull || !col(c).isin(vals: _*), lit(1))).as(s"ac$i") } ++
         fresh.zipWithIndex.map { case ((_, c, _), i) => max(col(c)).as(s"fr$i") })
      // level 2: fold the partials to one row of global counters
      val finals =
        Seq(coalesce(sum(when(col(k).isNull, col("cnt"))), lit(0L)).as("n_null"),
            count(when(col("cnt") > 1, lit(1))).as("n_dup")) ++
        ex.indices.map(i => coalesce(sum(col(s"ex$i")), lit(0L)).as(s"exs$i")) ++
        acc.indices.map(i => coalesce(sum(col(s"ac$i")), lit(0L)).as(s"acs$i")) ++
        fresh.indices.map(i => max(col(s"fr$i")).as(s"frm$i"))
      val rules =
        Seq(struct(lit("not_null").as("rule"), lit(t).as("table_name"),
              lit(k).as("target"), col("n_null").as("n_failing")),
            struct(lit("unique").as("rule"), lit(t).as("table_name"),
              lit(k).as("target"), col("n_dup").as("n_failing"))) ++
        ex.zipWithIndex.map { case ((_, e), i) =>
          struct(lit("expression_is_true").as("rule"), lit(t).as("table_name"),
            lit(e).as("target"), col(s"exs$i").as("n_failing")) } ++
        acc.zipWithIndex.map { case ((_, c, _), i) =>
          struct(lit("accepted_values").as("rule"), lit(t).as("table_name"),
            lit(c).as("target"), col(s"acs$i").as("n_failing")) } ++
        fresh.zipWithIndex.map { case ((_, c, days), i) =>
          struct(lit("freshness").as("rule"), lit(t).as("table_name"),
            lit(c).as("target"),
            when(col(s"frm$i").isNull ||
                datediff(graft.functions.Funcs.runDate, col(s"frm$i")) > days,
              lit(1L)).otherwise(lit(0L)).as("n_failing")) }
      m(t).groupBy(col(k)).agg(partials.head, partials.tail: _*)
        .agg(finals.head, finals.tail: _*)
        .select(explode(array(rules: _*)).as("r"))
        .select("r.*")
    }
    val rel = relationshipRules.map { case (ct, ck, pt, pk0) =>
      row("relationships", ct, s"$ck -> $pt.$pk0",
        m(ct).filter(col(ck).isNotNull)
          .join(m(pt).select(col(pk0).as(ck)).distinct(), Seq(ck), "left_anti")
          .agg(count(lit(1)).as("n_failing")))
    }
    // The 17 subplans are independent and each yields a handful of
    // rows, but a single unioned plan executes them as ONE job whose
    // fixed per-subplan costs (codegen, scan setup, one shuffle each)
    // serialize — measured at 6.9 s min in the r7 bench (VERDICT r7
    // #5). Run them as CONCURRENT jobs (the Mat per-key-futures
    // pattern; Spark's scheduler interleaves their stages across the
    // 32 cores) and union the collected 36 rows locally. Eager by
    // design: this is test-suite orchestration, not a lazy model —
    // dbt's `dbt test` likewise runs its rule queries in a thread
    // pool and assembles a results relation.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = graft.Mat.ec
    val subplans = perTable ++ rel
    val spark = subplans.head.sparkSession
    val schema = subplans.head.schema
    val futs = subplans.map(df => Future(df.collect()))
    val rows = futs.flatMap(f => Await.result(f, Duration.Inf))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
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
