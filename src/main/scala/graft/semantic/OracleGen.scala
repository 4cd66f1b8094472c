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
      // exact interpolated percentile — DuckDB's quantile_cont is the
      // same sort + linear-interpolation recipe as Spark `percentile`;
      // both ends quantize through decimal(18,9) (value_percentiles
      // recipe) to absorb last-ulp association differences
      case Percentile(p) =>
        s"cast(cast(quantile_cont(cast(($e) as double), $p) as decimal(18,9)) as double)"
    }
  }

  private def groupSql(model: SemanticModel, g: GroupBy): (String, String) = g match {
    case ByTime(grain) =>
      val t = model.timeDim.getOrElse(sys.error(s"no time dim on ${model.name}"))
      (s"cast(date_trunc('$grain', $t) as date)", "metric_time")
    case ByEntity(e) => (model.entities(e), e)
    case ByDimension(n) =>
      // local dims render their expr; entity-joined dims surface in
      // the src CTE under their output name
      if (model.dimensions.contains(n)) (model.dimension(n), n) else (n, n)
  }

  /** Entity-join source CTE (mirrors Planner.joinEntityDims): when the
    * query references `entity__…__dim` group-bys or filter tokens,
    * wrap the fact CTE with a CHAIN of 1:1 left joins per hop path —
    * intermediate hops join the owner CTE on its primary key and
    * expose the fk to the next hop; the FINAL hop is a subselect that
    * aliases each dimension EXPR to its output name inside the owner's
    * own projection (so computed dims — CASE exprs — stay valid SQL,
    * ADVICE r17). Exposes fact.* plus each joined dimension under its
    * output name, so measure exprs stay unqualified and unambiguous.
    * Returns (cteSqlOrEmpty, fromName). */
  private def entityJoinSrc(q: SavedQuery, registry: Registry,
      metrics: Seq[Metric], prefix: String): (String, String) = {
    val model = registry.model(q.model)
    val names = q.groupBys.collect {
      case ByDimension(n) if !model.dimensions.contains(n) => n
    } ++ metrics.collect { case Simple(_, _, Some(f)) => f }
      .flatMap(f => Spec.entityDimRefs(f, model.entities.keySet))
    val wanted = names.distinct.map { n =>
      val (hops, dim) = registry.resolveDim(model, n)
      (hops, dim, n)
    }
    if (wanted.isEmpty) return ("", cteOf(q.model))
    val byPath = wanted.groupBy(_._1.map(_._1)).toSeq.sortBy(_._1.mkString("__"))
    val dimCols = scala.collection.mutable.ArrayBuffer[String]()
    val joinSql = byPath.flatMap { case (pathNames, dims) =>
      val hops = dims.head._1
      val pathId = pathNames.mkString("_")
      // walk the chain: previous alias + the column carrying the key
      var prevAlias = "f"
      var prevKey = model.entities.getOrElse(pathNames.head,
        sys.error(s"model ${model.name} declares no entity ${pathNames.head}"))
      val mids = hops.init.zipWithIndex.map { case ((e, owner), i) =>
        val a = s"__h_${pathId}_$e"
        val j = s"left join ${cteOf(owner.name)} $a " +
          s"on $prevAlias.$prevKey = $a.${owner.entities(e)}"
        prevAlias = a
        prevKey = owner.entities(hops(i + 1)._1)
        j
      }
      val (lastE, lastOwner) = hops.last
      val lk = s"__k_$pathId"
      val la = s"__d_$pathId"
      val proj = (s"${lastOwner.entities(lastE)} as $lk" +:
        dims.map { case (_, d, out) => s"${lastOwner.dimension(d)} as $out" })
        .mkString(", ")
      dims.foreach { case (_, _, out) => dimCols += s"$la.$out as $out" }
      mids :+ (s"left join (select $proj from ${cteOf(lastOwner.name)}) $la " +
        s"on $prevAlias.$prevKey = $la.$lk")
    }
    val cte =
      s"""${prefix}src as (
         |  select f.*, ${dimCols.mkString(", ")}
         |  from ${cteOf(q.model)} f
         |  ${joinSql.mkString("\n  ")}
         |)""".stripMargin
    (cte, s"${prefix}src")
  }

  /** Core renderer: CTE list + final select for one saved query, with
    * every internal CTE name carrying `prefix` so multiple parts can
    * coexist inside one multi-model statement. */
  private def body(q: SavedQuery, registry: Registry,
      prefix: String): (Seq[String], String) = {
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
    // ALL non-time groups key the cumulative window and ride offset
    // joins — ByEntity AND ByDimension alike, mirroring the Planner's
    // entityNames (ADVICE r17: a cumulative grouped by a Dimension
    // must partition its running total by that dimension too)
    val keyGroups = q.groupBys.zip(groups).collect {
      case (g, gr) if !g.isInstanceOf[ByTime] => gr
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
        val part = if (keyGroups.isEmpty) ""
          else s"partition by ${keyGroups.map(_._1).mkString(", ")} "
        Seq(s"cast(sum(sum(${m.exprSql})) over (${part}order by $t rows between unbounded preceding and current row) as double) as $n")
      case Derived(_, _, _) => Nil
    }
    val (srcCte, fromName) = entityJoinSrc(q, registry, all, prefix)
    val base =
      s"""${prefix}base as (
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
          keyGroups.map(g => g._2)
      (alias,
        s"""${prefix}off_$alias as (
           |  select ${shiftedCols.mkString(", ")},
           |    ${in.metric} as $alias
           |  from ${prefix}base
           |)""".stripMargin)
    })

    val finalCols = q.metrics.map { n =>
      registry.metric(q.model, n) match {
        case d: Derived =>
          // qualify each input identifier in the derived expression
          val repl = d.inputs.map { in =>
            val alias = in.alias.getOrElse(in.metric)
            if (in.offsetMonths > 0) alias -> s"${prefix}off_$alias.$alias"
            else alias -> s"${prefix}base.${in.metric}"
          }
          val e = repl.foldLeft(d.expr) { case (acc, (from, to)) =>
            acc.replaceAll(s"\\b$from\\b", java.util.regex.Matcher.quoteReplacement(to))
          }
          s"$e as ${d.name}"
        case _ => s"${prefix}base.$n"
      }
    }

    val joins = offsetCtes.map { case (alias, _) =>
      s"left join ${prefix}off_$alias using (${gNames.mkString(", ")})"
    }.mkString("\n")

    val ctes = (if (srcCte.isEmpty) Nil else Seq(srcCte)) ++
      Seq(base) ++ offsetCtes.map(_._2)
    val sel =
      s"""select ${gNames.map(n => s"${prefix}base.$n").mkString(", ")}, ${finalCols.mkString(", ")}
         |from ${prefix}base
         |$joins""".stripMargin
    (ctes, sel)
  }

  def savedQuery(q: SavedQuery, registry: Registry, ctes: String): String = {
    val (qCtes, sel) = body(q, registry, "sq_")
    val withPrefix =
      if (ctes.isEmpty) s"with ${qCtes.mkString(",\n")}"
      else s"$ctes,\n${qCtes.mkString(",\n")}"
    s"$withPrefix\n$sel"
  }

  /** Multi-model query: each part renders with its own CTE prefix and
    * wraps as a named CTE; the final select full-outer-joins the
    * aggregated parts on the shared group key — USING columns
    * coalesce (SQL standard, both engines), so a group present in
    * either fact appears once. */
  def multiQuery(q: MultiModelQuery, registry: Registry, ctes: String): String = {
    val gNames = q.parts.head.groupBys.map(
      g => groupSql(registry.model(q.parts.head.model), g)._2)
    val parts = q.parts.zipWithIndex.map { case (p, i) =>
      val (pCtes, sel) = body(p, registry, s"mm${i}_")
      pCtes :+ s"mm$i as (\n$sel\n)"
    }
    val allCtes = parts.flatten
    val joins = (1 until q.parts.size)
      .map(i => s"full outer join mm$i using (${gNames.mkString(", ")})")
      .mkString("\n")
    val metricCols = q.parts.zipWithIndex.flatMap { case (p, i) =>
      p.metrics.map(m => s"mm$i.$m as $m")
    }
    val withPrefix =
      if (ctes.isEmpty) s"with ${allCtes.mkString(",\n")}"
      else s"$ctes,\n${allCtes.mkString(",\n")}"
    s"""$withPrefix
       |select ${gNames.mkString(", ")}, ${metricCols.mkString(", ")}
       |from mm0
       |$joins""".stripMargin
  }
}
