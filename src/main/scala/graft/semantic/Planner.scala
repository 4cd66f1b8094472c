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
      // EXACT percentile (sort + linear interpolation — Spark
      // `percentile`, not the approximate sketch): order-independent
      // like Median. Engines interpolate (1-d)·a + d·b with differing
      // association, so the output runs through the decimal(18,9)
      // quantization (the value_percentiles recipe) to absorb the
      // last-ulp divergence vs DuckDB's quantile_cont.
      case Percentile(p) => percentile(e.cast("double"), lit(p))
        .cast(org.apache.spark.sql.types.DecimalType(18, 9)).cast("double")
    }
  }

  private def groupCol(model: SemanticModel, g: GroupBy): Column = g match {
    case ByTime(grain) =>
      val t = model.timeDim.getOrElse(sys.error(s"model ${model.name} has no time dimension"))
      date_trunc(grain, col(t)).cast(DateType).as("metric_time")
    case ByEntity(e) =>
      col(model.entities.getOrElse(e, sys.error(s"unknown entity $e"))).as(e)
    case ByDimension(n) =>
      // a name in the model's own dimensions map is local; anything
      // else was pre-joined onto the fact under its output name by
      // `joinEntityDims` — group by the joined column
      if (model.dimensions.contains(n)) expr(model.dimension(n)).as(n)
      else col(n)
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

  /** All `entity__…__dim` references a query resolves through the
    * fact model's declared entities: group-bys plus metric FILTERS
    * (MetricFlow's `where: Dimension('customer__customer_type') = …`
    * on a simple metric) — a filtered metric can slice by a joined
    * dimension without grouping by it. Each ref is resolved against
    * the entity graph (Registry.resolveDim) into a hop path, so
    * single-hop (`customer__customer_type` on orders) and multi-hop
    * (`order__customer__customer_type` on order_items) flow through
    * the same machinery. Returns (hops, dim, outputName) triples. */
  private def wantedEntityDims(q: SavedQuery, registry: Registry,
      metrics: Seq[Metric]): Seq[(Seq[(String, SemanticModel)], String, String)] = {
    val model = registry.model(q.model)
    val names = q.groupBys.collect {
      case ByDimension(n) if !model.dimensions.contains(n) => n
    } ++ metrics.collect { case Simple(_, _, Some(f)) => f }
      .flatMap(f => Spec.entityDimRefs(f, model.entities.keySet))
    names.distinct.map { n =>
      val (hops, dim) = registry.resolveDim(model, n)
      (hops, dim, n)
    }
  }

  /** Pre-join entity-reached dimensions onto the fact (MetricFlow's
    * entity-join, the reason fact models declare foreign entities —
    * reference orders.yml:64-69, order_items.yml:54-59). Dims sharing
    * a hop path ride ONE chain of 1:1 left joins on entity primary
    * keys — the saved query still scans the fact once and still costs
    * one hash-agg shuffle.
    *
    * Scale: the dim side is broadcast-hinted ONLY when every model on
    * the hop path declares `bounded` (products/locations: enumerable
    * catalogs). A customer-grain dim grows WITH the fact — billions
    * of rows at 100 TB — so fact-scaled owners get no hint: AQE
    * broadcasts them while they're measurably small and falls back to
    * a shuffled join on the entity key once they aren't, which is the
    * correct 100 TB plan (one extra fact shuffle, no OOM path). */
  private def joinEntityDims(q: SavedQuery, registry: Registry, df: DataFrame,
      metrics: Seq[Metric], dimBacking: String => DataFrame): DataFrame = {
    val model = registry.model(q.model)
    val wanted = wantedEntityDims(q, registry, metrics)
    val byPath = wanted.groupBy(_._1.map(_._1)).toSeq.sortBy(_._1.mkString("__"))
    byPath.foldLeft(df) { case (acc, (pathNames, dims)) =>
      val hops = dims.head._1
      val outs = dims.map { case (_, d, out) => (d, out) }
      // compose the dim side from the deepest hop outward: the final
      // owner contributes (pk, dims); each intermediate owner joins
      // 1:1 on its fk and re-keys by its own pk
      def side(rest: Seq[(String, SemanticModel)]): (DataFrame, String) = {
        val (e, owner) = rest.head
        val k = s"__ek_$e"
        if (rest.size == 1) {
          (dimBacking(owner.name).select(
            col(owner.entities(e)).as(k) +:
              outs.map { case (d, out) => expr(owner.dimension(d)).as(out) }: _*), k)
        } else {
          val (inner, kIn) = side(rest.tail)
          val fk = owner.entities(rest.tail.head._1)
          val mid = dimBacking(owner.name).select(col(owner.entities(e)).as(k), col(fk))
          (mid.join(inner, mid(fk) === inner(kIn), "left")
            .select(col(k) +: outs.map { case (_, out) => col(out) }: _*), k)
        }
      }
      val (dimSel, k) = side(hops)
      val factKey = model.entities.getOrElse(pathNames.head,
        sys.error(s"model ${model.name} declares no entity ${pathNames.head}"))
      val sided = if (hops.forall(_._2.bounded)) broadcast(dimSel) else dimSel
      acc.join(sided, acc(factKey) === dimSel(k), "left").drop(k)
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

  /** Multi-model metric query (MetricFlow's cross-model composition):
    * compile each part with its own single-scan plan, then full-outer-
    * join the AGGREGATED frames — one row per group key, so the join
    * is dim-sized however large the facts are; no fact joins a fact.
    * Group columns coalesce across parts (Spark's using-column join),
    * so a month present in either fact appears once. */
  def multiQuery(q: MultiModelQuery, registry: Registry,
      backing: String => DataFrame): DataFrame = {
    val gNames = q.parts.head.groupBys.map(groupName)
    val frames = q.parts.map(p => savedQuery(p, registry, backing(p.model), backing))
    frames.reduce((a, b) => a.join(b, gNames, "full"))
      .select((gNames.map(col) ++ q.parts.flatMap(_.metrics).map(col)): _*)
  }

  def nameOf(g: GroupBy): String = groupName(g)
}
