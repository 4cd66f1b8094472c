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
    case d @ ByDimension(n) => d.entityPath match {
      // entity-joined dims surface in sq_src under their output name
      case Some(_) => (n, n)
      case None => (model.dimension(n), n)
    }
  }

  /** Entity-join source CTE (mirrors Planner.joinEntityDims): when the
    * query references `entity__dim` group-bys, wrap the fact CTE with
    * one LEFT JOIN per foreign entity against the owning model's CTE,
    * exposing fact.* plus each joined dimension under its output name
    * — so measure exprs stay unqualified and unambiguous. Returns
    * (cteSqlOrEmpty, fromName). */
  private def entityJoinSrc(q: SavedQuery, registry: Registry,
      metrics: Seq[Metric]): (String, String) = {
    val model = registry.model(q.model)
    val fromGroups = q.groupBys.collect {
      case d: ByDimension if d.entityPath.isDefined => (d.entityPath.get, d.name)
    }
    // filters referencing entity-joined dims (mirrors
    // Planner.wantedEntityDims)
    val fromFilters = metrics.collect { case Simple(_, _, Some(f)) => f }
      .flatMap(f => Spec.entityDimRefs(f, model.entities.keySet))
      .map { case (e, d, tok) => ((e, d), tok) }
    val wanted = (fromGroups ++ fromFilters).distinct
    if (wanted.isEmpty) return ("", cteOf(q.model))
    val joins = wanted.groupBy(_._1._1).toSeq.sortBy(_._1)
    val dimCols = joins.flatMap { case (entity, dims) =>
      dims.map { case ((_, d), out) =>
        s"__dim_$entity.${registry.model(registry.entityOwner(entity)).dimension(d)} as $out"
      }
    }
    val joinSql = joins.map { case (entity, _) =>
      val owner = registry.model(registry.entityOwner(entity))
      val factKey = model.entities.getOrElse(entity,
        sys.error(s"model ${model.name} declares no entity $entity"))
      s"left join ${cteOf(owner.name)} __dim_$entity " +
        s"on f.$factKey = __dim_$entity.${owner.entities(entity)}"
    }
    val cte =
      s"""sq_src as (
         |  select f.*, ${dimCols.mkString(", ")}
         |  from ${cteOf(q.model)} f
         |  ${joinSql.mkString("\n  ")}
         |)""".stripMargin
    (cte, "sq_src")
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
    val groups = q.groupBys.map(groupSql(model, _))   // (expr, name) per dim
    val gNames = groups.map(_._2)
    val timeExprName = q.groupBys.zip(groups).collectFirst {
      case (_: ByTime, (e, n)) => (e, n)
    }
    val entityGroups = q.groupBys.zip(groups).collect {
      case (_: ByEntity, g) => g
    }

    def simpleAgg(name: String): String = all.collectFirst {
      case Simple(`name`, meas, f) => aggSql(model.measure(meas), f)
    }.getOrElse(sys.error(s"metric $name not resolvable in ${q.name}"))

    // base aggregation: every Simple/Ratio/Cumulative output. The
    // cumulative window mirrors the Planner: partition by the non-time
    // dims, order by the time expression.
    val baseCols = all.flatMap {
      case Simple(n, meas, f) => Seq(s"${aggSql(model.measure(meas), f)} as $n")
      case Ratio(n, num, den) =>
        val dn = simpleAgg(den)
        Seq(s"case when ($dn) <> 0 then (${simpleAgg(num)}) / ($dn) end as $n")
      case Cumulative(n, meas) =>
        val m = model.measure(meas)
        val t = timeExprName.getOrElse(sys.error(s"cumulative $n needs time grouping"))._1
        val part = if (entityGroups.isEmpty) ""
          else s"partition by ${entityGroups.map(_._1).mkString(", ")} "
        Seq(s"cast(sum(sum(${m.exprSql})) over (${part}order by $t rows between unbounded preceding and current row) as double) as $n")
      case Derived(_, _, _) => Nil
    }
    val (srcCte, fromName) = entityJoinSrc(q, registry, all)
    val base =
      s"""sq_base as (
         |  select ${groups.map { case (e, n) => s"$e as $n" }.mkString(", ")},
         |    ${baseCols.mkString(",\n    ")}
         |  from $fromName
         |  group by ${(1 to groups.size).mkString(", ")}
         |)""".stripMargin

    // offset CTEs + the final select with derived expressions.
    val deriveds = all.collect { case d: Derived => d }
    val offsetCtes = deriveds.flatMap(d => d.inputs.filter(_.offsetMonths > 0).map { in =>
      val alias = in.alias.getOrElse(in.metric)
      val tName = timeExprName.getOrElse(sys.error(s"offset $alias needs time grouping"))._2
      val shiftedCols =
        s"cast(($tName + interval ${in.offsetMonths} month) as date) as $tName" +:
          entityGroups.map(g => g._2)
      (alias,
        s"""sq_off_$alias as (
           |  select ${shiftedCols.mkString(", ")},
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
      s"left join sq_off_$alias using (${gNames.mkString(", ")})"
    }.mkString("\n")

    val srcPrefix = if (srcCte.isEmpty) "" else s"$srcCte,\n"
    val withPrefix =
      if (ctes.isEmpty) s"with $srcPrefix$base${offsetCtes.map(c => ",\n" + c._2).mkString}"
      else s"$ctes,\n$srcPrefix$base${offsetCtes.map(c => ",\n" + c._2).mkString}"

    s"""$withPrefix
       |select ${gNames.map(n => s"sq_base.$n").mkString(", ")}, ${finalCols.mkString(", ")}
       |from sq_base
       |$joins""".stripMargin
  }
}
