package graft.semantic

import graft.semantic.Spec._

/** Renders a SavedQuery spec as DuckDB SQL — the SAME spec the Planner
  * compiles to DataFrame ops, so oracle and engine share every measure
  * expression, filter, and threshold by construction.
  */
object OracleGen {

  /** semantic model name → CTE name inside graft.oracle.Sql.allCtes. */
  private val cteOf = Map(
    "orders" -> "orders_mart",
    "order_items" -> "order_items",
    "customers" -> "customers_mart",
    "products" -> "products_mart",
    "locations" -> "locations_mart",
    "supplies" -> "supplies_mart",
    "customer_segmentation" -> "customer_segmentation",
    "time_analytics" -> "time_analytics")

  private def filtered(e: String, filter: Option[String]): String =
    filter match {
      case Some(f) => s"case when $f then ($e) end"
      case None => e
    }

  private def aggSql(m: Measure, filter: Option[String]): String = {
    val e = filtered(m.exprSql, filter)
    m.agg match {
      case Sum if m.isCount => s"cast(sum($e) as bigint)"
      case Sum => s"cast(sum($e) as double)"
      case CountDistinct => s"count(distinct $e)"
      case Avg => s"case when count($e) > 0 then cast(sum($e) as double) / cast(count($e) as double) end"
      case Median => s"median(cast(($e) as double))"
    }
  }

  private def groupSql(model: SemanticModel, g: GroupBy): (String, String) = g match {
    case ByTime(grain) =>
      val t = model.timeDim.getOrElse(sys.error(s"no time dim on ${model.name}"))
      (s"cast(date_trunc('$grain', $t) as date)", "metric_time")
    case ByEntity(e) => (model.entities(e), e)
  }

  def savedQuery(q: SavedQuery, registry: Registry, ctes: String): String = {
    val model = registry.model(q.model)
    val requested = q.metrics.map(registry.metric(q.model, _))
    val deps = requested.flatMap {
      case Ratio(_, n, d) => Seq(n, d)
      case Derived(_, _, ins) => ins.map(_.metric)
      case _ => Nil
    }.distinct.filterNot(q.metrics.contains).map(registry.metric(q.model, _))
    val all = requested ++ deps
    val (gExpr, gName) = groupSql(model, q.groupBy)

    def simpleAgg(name: String): String = all.collectFirst {
      case Simple(`name`, meas, f) => aggSql(model.measure(meas), f)
    }.getOrElse(sys.error(s"metric $name not resolvable in ${q.name}"))

    // base aggregation: every Simple/Ratio/Cumulative output.
    val baseCols = all.flatMap {
      case Simple(n, meas, f) => Seq(s"${aggSql(model.measure(meas), f)} as $n")
      case Ratio(n, num, den) =>
        val dn = simpleAgg(den)
        Seq(s"case when ($dn) <> 0 then (${simpleAgg(num)}) / ($dn) end as $n")
      case Cumulative(n, meas) =>
        val m = model.measure(meas)
        Seq(s"cast(sum(sum(${m.exprSql})) over (order by $gExpr rows between unbounded preceding and current row) as double) as $n")
      case Derived(_, _, _) => Nil
    }
    val base =
      s"""sq_base as (
         |  select $gExpr as $gName,
         |    ${baseCols.mkString(",\n    ")}
         |  from ${cteOf(q.model)}
         |  group by 1
         |)""".stripMargin

    // offset CTEs + the final select with derived expressions.
    val deriveds = all.collect { case d: Derived => d }
    val offsetCtes = deriveds.flatMap(d => d.inputs.filter(_.offsetMonths > 0).map { in =>
      val alias = in.alias.getOrElse(in.metric)
      (alias,
        s"""sq_off_$alias as (
           |  select cast(($gName + interval ${in.offsetMonths} month) as date) as $gName,
           |    ${in.metric} as $alias
           |  from sq_base
           |)""".stripMargin)
    })

    val finalCols = q.metrics.map { n =>
      registry.metric(q.model, n) match {
        case d: Derived =>
          // qualify each input identifier in the derived expression
          val repl = d.inputs.map { in =>
            val alias = in.alias.getOrElse(in.metric)
            if (in.offsetMonths > 0) alias -> s"sq_off_$alias.$alias"
            else alias -> s"sq_base.${in.metric}"
          }
          val e = repl.foldLeft(d.expr) { case (acc, (from, to)) =>
            acc.replaceAll(s"\\b$from\\b", java.util.regex.Matcher.quoteReplacement(to))
          }
          s"$e as ${d.name}"
        case _ => s"sq_base.$n"
      }
    }

    val joins = offsetCtes.map { case (alias, _) =>
      s"left join sq_off_$alias using ($gName)"
    }.mkString("\n")

    val withPrefix =
      if (ctes.isEmpty) s"with $base${offsetCtes.map(c => ",\n" + c._2).mkString}"
      else s"$ctes,\n$base${offsetCtes.map(c => ",\n" + c._2).mkString}"

    s"""$withPrefix
       |select sq_base.$gName, ${finalCols.mkString(", ")}
       |from sq_base
       |$joins""".stripMargin
  }
}
