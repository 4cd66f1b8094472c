package graft.semantic

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType
import graft.semantic.Spec._

/** Compiles a SavedQuery spec into ONE single-scan groupBy/agg plan —
  * simple/ratio metrics (with per-metric filters) all evaluate as
  * conditional aggregates in the same hash aggregation, so a saved
  * query costs one shuffle regardless of metric count. Derived offsets
  * add one self-join on the shifted grain; cumulative adds one window
  * over the (already aggregated) time rows. That is the plan shape a
  * 100 TB run wants: fact scanned once, aggregates combined map-side.
  */
object Planner {

  private def aggCol(model: SemanticModel, m: Measure, filter: Option[String]): Column = {
    val base = expr(m.exprSql)
    val e = filter match {
      case Some(f) => when(expr(f), base)
      case None => base
    }
    m.agg match {
      case Sum if m.isCount => sum(e)                       // stays long
      case Sum => sum(e).cast("double")                     // exact sum, then present
      case CountDistinct => countDistinct(e)
      case Avg => when(count(e) > 0, sum(e).cast("double") / count(e).cast("double"))
      case Median => median(e.cast("double"))               // doubles: same sort+interpolate both engines
    }
  }

  private def groupCol(model: SemanticModel, g: GroupBy): Column = g match {
    case ByTime(grain) =>
      val t = model.timeDim.getOrElse(sys.error(s"model ${model.name} has no time dimension"))
      date_trunc(grain, col(t)).cast(DateType).as("metric_time")
    case ByEntity(e) =>
      col(model.entities.getOrElse(e, sys.error(s"unknown entity $e"))).as(e)
    case d @ ByDimension(n) => d.entityPath match {
      // entity-joined dims were pre-joined onto the fact under their
      // output name by `joinEntityDims` — group by the joined column
      case Some(_) => col(n)
      case None => expr(model.dimension(n)).as(n)
    }
  }

  private def groupName(g: GroupBy): String = g match {
    case ByTime(_) => "metric_time"
    case ByEntity(e) => e
    case ByDimension(n) => n
  }

  /** Time-grain groups span partitions, so a Sum/Avg/Cumulative over a
    * double-typed measure would fold IEEE doubles in partition order —
    * nondeterministic and free to drift from the oracle's sequential
    * sum (ADVICE r2). Exact types (decimal/integral) are associative;
    * Median sorts (order-independent). Reject the flaky combination at
    * compile time: the fix is a decimal cast in the measure expr (see
    * the time_analytics daily_revenue measure). Entity grains are
    * exempt only because their groups are single mart rows —
    * categorical Dimension grains group MANY rows, so they carry the
    * same requirement as time grains. */
  private def requireExactForTimeGrain(model: SemanticModel, metrics: Seq[Metric], df: DataFrame): Unit = {
    def check(measName: String): Unit = {
      val m = model.measure(measName)
      if (m.agg == Sum || m.agg == Avg) {
        val t = df.select(expr(m.exprSql)).schema.head.dataType
        require(t != org.apache.spark.sql.types.DoubleType &&
          t != org.apache.spark.sql.types.FloatType,
          s"measure $measName sums/averages a $t at a time grain — " +
            "partition-order dependent; cast the measure expr to an exact decimal")
      }
    }
    metrics.foreach {
      case Simple(_, meas, _) => check(meas)
      case Cumulative(_, meas) => check(meas)
      case _ => ()
    }
  }

  /** Resolve a metric name to its aggregate columns. Simple/Ratio
    * compile inline; Derived/Cumulative are handled in `savedQuery`.
    * Multiple dimensions group together in the same hash aggregation;
    * offset joins carry the full dimension key, and cumulative windows
    * PARTITION by the non-time dimensions (keyed window — with a second
    * dimension present the running total never needs a global sort). */
  def compile(model: SemanticModel, metrics: Seq[Metric], df: DataFrame, gs: Seq[GroupBy]): DataFrame = {
    val gNames = gs.map(groupName)
    val timeName = gs.collectFirst { case g: ByTime => groupName(g) }
    val entityNames = gNames.filterNot(timeName.contains)
    if (timeName.isDefined || gs.exists(_.isInstanceOf[ByDimension]))
      requireExactForTimeGrain(model, metrics, df)

    val simpleAggs: Seq[(String, Column)] = metrics.flatMap {
      case Simple(n, meas, f) => Seq(n -> aggCol(model, model.measure(meas), f).as(n))
      case Ratio(n, num, den) =>
        // numerator/denominator are metric names resolved in this list
        def part(mn: String): Column = metrics.collectFirst {
          case Simple(`mn`, meas, f) => aggCol(model, model.measure(meas), f)
        }.getOrElse(sys.error(s"ratio $n: metric $mn not in query"))
        val d = part(den)
        Seq(n -> when(d =!= 0, part(num).cast("double") / d.cast("double")).as(n))
      case Cumulative(n, meas) =>
        // keep the per-grain base EXACT (decimal); the running window
        // sums decimals and only the final cast presents a double.
        Seq(s"__base_$n" -> sum(expr(model.measure(meas).exprSql)).as(s"__base_$n"))
      case Derived(_, _, inputs) =>
        // inputs must appear as metrics in this query (deps are pulled
        // in by savedQuery); they aggregate under their own names.
        inputs.foreach { in =>
          require(metrics.exists {
            case Simple(n, _, _) => n == in.metric
            case _ => false
          }, s"derived input ${in.metric} must be a Simple metric in the query")
        }
        Nil
    }

    val grouped = df.groupBy(gs.map(groupCol(model, _)): _*)
      .agg(simpleAggs.head._2, simpleAggs.tail.map(_._2): _*)

    // Derived (M5/M6) and Cumulative (M7) post-processing.
    val withOffsets = metrics.foldLeft(grouped) {
      case (acc, Derived(n, e, inputs)) =>
        val withIn = inputs.foldLeft(acc) { (a, in) =>
          val alias = in.alias.getOrElse(in.metric)
          if (in.offsetMonths == 0) {
            if (alias == in.metric) a
            else a.withColumn(alias, col(in.metric))
          } else {
            val t = timeName.getOrElse(sys.error(s"offset metric $n needs time grouping"))
            // shift the time key, carry the full dimension key through
            val shifted = acc.select(
              (add_months(col(t), in.offsetMonths).as(t) +:
                (entityNames.map(col) :+ col(in.metric).as(alias))): _*)
            a.join(shifted, gNames, "left")
          }
        }
        withIn.withColumn(n, expr(e))
      case (acc, Cumulative(n, _)) =>
        val t = timeName.getOrElse(sys.error(s"cumulative metric $n needs time grouping"))
        // no non-time dims -> the running total is a calendar-bounded
        // single-partition window over ALREADY-AGGREGATED rows: use
        // the declared bounded form, not an accidental-looking empty
        // partitionBy
        val w = (if (entityNames.isEmpty) graft.operators.BoundedWindow.all
          else Window.partitionBy(entityNames.map(col): _*))
          .orderBy(col(t)).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        acc.withColumn(n, sum(col(s"__base_$n")).over(w).cast("double"))
      case (acc, _) => acc
    }

    // project: group cols + requested metrics (drop derived scaffolding)
    withOffsets.select((gNames.map(col) ++ metrics.map(m => col(m.name))): _*)
  }

  /** Pre-join entity-reached dimensions onto the fact (MetricFlow's
    * entity-join, the reason fact models declare foreign entities —
    * reference orders.yml:64-69). Each referenced foreign entity
    * contributes ONE broadcast left join of the owning model's
    * (primary-key, dims) projection: the dim side is entity-grain
    * (its primary key), so the join is 1:1 and broadcast-sized — the
    * saved query still costs one shuffle (the hash aggregation) over
    * one fact scan at any fact size; only the dim model must stay
    * broadcastable, which entity-grain dims are by construction. */
  /** All `entity__dim` references a query resolves through the fact
    * model's foreign entities: group-bys plus metric FILTERS
    * (MetricFlow's `where: Dimension('customer__customer_type') = …`
    * on a simple metric) — a filtered metric can slice by a joined
    * dimension without grouping by it. */
  private def wantedEntityDims(q: SavedQuery, registry: Registry,
      metrics: Seq[Metric]): Seq[((String, String), String)] = {
    val model = registry.model(q.model)
    val fromGroups = q.groupBys.collect {
      case d: ByDimension if d.entityPath.isDefined => (d.entityPath.get, d.name)
    }
    val fromFilters = metrics.collect { case Simple(_, _, Some(f)) => f }
      .flatMap(f => Spec.entityDimRefs(f, model.entities.keySet))
      .map { case (e, d, tok) => ((e, d), tok) }
    (fromGroups ++ fromFilters).distinct
  }

  private def joinEntityDims(q: SavedQuery, registry: Registry, df: DataFrame,
      metrics: Seq[Metric], dimBacking: String => DataFrame): DataFrame = {
    val model = registry.model(q.model)
    val wanted = wantedEntityDims(q, registry, metrics)
    wanted.groupBy(_._1._1).toSeq.sortBy(_._1).foldLeft(df) {
      case (acc, (entity, dims)) =>
        val factKey = model.entities.getOrElse(entity,
          sys.error(s"model ${model.name} declares no entity $entity"))
        val ownerName = registry.entityOwner.getOrElse(entity,
          sys.error(s"no semantic model owns entity $entity as primary"))
        val owner = registry.model(ownerName)
        val k = s"__ek_$entity"
        val dimSel = dimBacking(ownerName).select(
          (col(owner.entities(entity)).as(k) +:
            dims.map { case ((_, d), out) => expr(owner.dimension(d)).as(out) }): _*)
        acc.join(broadcast(dimSel), acc(factKey) === dimSel(k), "left").drop(k)
    }
  }

  def savedQuery(q: SavedQuery, registry: Registry, df: DataFrame,
      dimBacking: String => DataFrame =
        n => sys.error(s"entity-join needs a backing resolver (model $n)")): DataFrame = {
    val model = registry.model(q.model)
    val metrics = q.metrics.map(registry.metric(q.model, _))
    // pull in ratio/derived dependencies as hidden simple metrics
    val deps = metrics.flatMap {
      case Ratio(_, n, d) => Seq(n, d)
      case Derived(_, _, ins) => ins.map(_.metric)
      case _ => Nil
    }.distinct.filterNot(q.metrics.contains).map(registry.metric(q.model, _))
    val all = metrics ++ deps
    val out = compile(model, all, joinEntityDims(q, registry, df, all, dimBacking), q.groupBys)
    out.select((q.groupBys.map(g => col(groupName(g))) ++ q.metrics.map(col)): _*)
  }

  def nameOf(g: GroupBy): String = groupName(g)
}
