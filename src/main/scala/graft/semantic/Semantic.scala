package graft.semantic

/** MetricFlow-style semantic layer spec (SURVEY §2.9 M1-M8; reference
  * `models/marts yml files` semantic_models/metrics/saved_queries).
  *
  * The spec is declared ONCE as data and compiled twice: Planner turns
  * it into a single-scan groupBy/agg DataFrame plan; OracleGen renders
  * the same spec as DuckDB SQL. Both compilers share every expression
  * string, so the oracle cannot drift from the engine.
  *
  * Measure/filter expressions are small ANSI SQL fragments over the
  * backing mart's columns — parsed by Spark's `expr()` and pasted
  * verbatim into the oracle (the shared dialect subset: case/when,
  * comparisons, arithmetic, column refs).
  */
object Spec {

  sealed trait Agg
  case object Sum extends Agg
  case object Avg extends Agg            // compiled as sum/count double
  case object CountDistinct extends Agg
  case object Median extends Agg         // exact median over doubles

  /** M1/M2: measure = agg over an expression of the model (expr
    * defaults to the measure name as a column). */
  case class Measure(name: String, agg: Agg, expr: Option[String] = None) {
    def exprSql: String = expr.getOrElse(name)
    /** count-like measures keep long type; everything else presents as
      * double at the output boundary (both engines). */
    def isCount: Boolean = agg == CountDistinct || (agg == Sum && exprSql.trim == "1")
  }

  /** M1: semantic model over a mart: entities (name → column), an
    * agg-time dimension, measures, and categorical dimensions (name →
    * SQL expr over the mart, reference `dimensions:` blocks in every
    * mart yml, e.g. customers.yml:46-58). */
  case class SemanticModel(
      name: String,
      timeDim: Option[String],
      entities: Map[String, String],
      measures: Seq[Measure],
      dimensions: Map[String, String] = Map.empty) {
    def measure(n: String): Measure =
      measures.find(_.name == n).getOrElse(sys.error(s"unknown measure $n in $name"))
    def dimension(n: String): String =
      dimensions.getOrElse(n, sys.error(s"unknown dimension $n in $name"))
  }

  sealed trait Metric { def name: String }
  /** M3: simple metric, optionally with a dimension filter. */
  case class Simple(name: String, measure: String, filter: Option[String] = None) extends Metric
  /** M4: ratio of two simple metrics. */
  case class Ratio(name: String, numerator: String, denominator: String) extends Metric
  /** M5/M6: expression over input metrics; offsetMonths>0 reads the
    * input shifted by N months (requires time grouping). */
  case class MetricInput(metric: String, alias: Option[String] = None, offsetMonths: Int = 0)
  case class Derived(name: String, expr: String, inputs: Seq[MetricInput]) extends Metric
  /** M7: all-time running total of a measure (requires time grouping). */
  case class Cumulative(name: String, measure: String) extends Metric

  sealed trait GroupBy
  /** TimeDimension('metric_time', grain): grain ∈ day|week|month. */
  case class ByTime(grain: String) extends GroupBy
  /** Entity('name'). */
  case class ByEntity(entity: String) extends GroupBy
  /** Dimension('name') or Dimension('entity__name') — a categorical
    * dimension on this model, or on the model reached through one of
    * this model's declared FOREIGN entities (MetricFlow's entity-join:
    * orders declares `customer`/`location` foreign entities,
    * reference orders.yml:64-69, precisely so `orders` measures can
    * group by e.g. `customer__customer_type`). The output column is
    * named exactly as written, MetricFlow's `entity__dim` convention. */
  case class ByDimension(name: String) extends GroupBy {
    /** Some((entity, dim)) for the entity-join form, None for local. */
    def entityPath: Option[(String, String)] = {
      val i = name.indexOf("__")
      if (i > 0) Some((name.substring(0, i), name.substring(i + 2))) else None
    }
  }

  /** M8: saved query = metrics + group_bys over one semantic model,
    * exported as a table. Multiple dimensions compose (e.g. time ×
    * entity); at most one ByTime (offset/cumulative metrics anchor to
    * it, partitioned by the remaining dimensions). */
  case class SavedQuery(name: String, model: String, metrics: Seq[String], groupBys: Seq[GroupBy]) {
    require(groupBys.nonEmpty, s"saved query $name needs at least one group_by")
    require(groupBys.count(_.isInstanceOf[ByTime]) <= 1,
      s"saved query $name: at most one time dimension")
  }

  /** `entity__dim` references inside a SQL fragment (metric filters —
    * MetricFlow's `where: Dimension('customer__customer_type') = …`),
    * restricted to the model's DECLARED entities so ordinary
    * double-underscore identifiers never false-positive. Returned as
    * (entity, dim, fullToken), deduped, token order. */
  private val EntityDimToken =
    """([A-Za-z_][A-Za-z0-9_]*?)__([A-Za-z_][A-Za-z0-9_]*)""".r
  def entityDimRefs(sql: String, declaredEntities: Set[String]): Seq[(String, String, String)] =
    EntityDimToken.findAllMatchIn(sql)
      .map(m => (m.group(1), m.group(2), m.matched))
      .filter { case (e, _, _) => declaredEntities.contains(e) }
      .toSeq.distinct
}
