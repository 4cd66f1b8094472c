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
  /** MetricFlow `agg: percentile` + `agg_params: {percentile: p}` —
    * EXACT sort-based percentile with linear interpolation (Spark
    * `percentile`, DuckDB `quantile_cont`: the same interpolation
    * recipe, so both engines agree bit-for-bit on doubles). Sorting
    * makes it partition-order independent, like Median. */
  case class Percentile(p: Double) extends Agg

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
    * mart yml, e.g. customers.yml:46-58).
    *
    * `bounded` declares whether the model's GRAIN is a bounded domain
    * (products/locations: enumerable catalogs that do not grow with
    * fact volume) or fact-scaled (customers/orders: row count grows
    * with the corpus). The planner uses it to decide whether an
    * entity-join dim side may be broadcast-hinted — a fact-scaled dim
    * force-broadcast at 100 TB is an executor OOM, so only bounded
    * owners get the hint and AQE decides for the rest. */
  case class SemanticModel(
      name: String,
      timeDim: Option[String],
      entities: Map[String, String],
      measures: Seq[Measure],
      dimensions: Map[String, String] = Map.empty,
      bounded: Boolean = false) {
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
  /** Dimension('name'), Dimension('entity__name'), or the multi-hop
    * Dimension('e1__e2__…__name') — a categorical dimension on this
    * model, or on a model reached through a CHAIN of declared foreign
    * entities (MetricFlow resolves arbitrary entity paths: orders
    * declares `customer`/`location`, reference orders.yml:64-69, and
    * order_items declares `order`, order_items.yml:54-56, so
    * `order__customer__customer_type` on order_items reaches customers
    * through orders). The output column is named exactly as written,
    * MetricFlow's `entity__dim` convention. Resolution against the
    * declared entity graph lives in Registry.resolveDim — a name is
    * "local" iff it is declared in the model's own dimensions map. */
  case class ByDimension(name: String) extends GroupBy

  /** M8: saved query = metrics + group_bys over one semantic model,
    * exported as a table. Multiple dimensions compose (e.g. time ×
    * entity); at most one ByTime (offset/cumulative metrics anchor to
    * it, partitioned by the remaining dimensions). */
  case class SavedQuery(name: String, model: String, metrics: Seq[String], groupBys: Seq[GroupBy]) {
    require(groupBys.nonEmpty, s"saved query $name needs at least one group_by")
    require(groupBys.count(_.isInstanceOf[ByTime]) <= 1,
      s"saved query $name: at most one time dimension")
  }

  /** MetricFlow multi-model query: metrics from DIFFERENT semantic
    * models requested side by side, composed on a shared group key
    * (metric_time or a shared entity). Each part aggregates its own
    * fact with the single-scan plan, then the aggregated frames —
    * tiny, one row per group — full-outer-join on the group columns:
    * no fact ever joins a fact. Parts must group identically and
    * export disjoint metric names. */
  case class MultiModelQuery(name: String, parts: Seq[SavedQuery]) {
    require(parts.size >= 2, s"multi-model query $name needs >= 2 parts")
    require(parts.map(_.groupBys).distinct.size == 1,
      s"multi-model query $name: parts must share the same group_bys")
    private val outs = parts.flatMap(_.metrics)
    require(outs.distinct.size == outs.size,
      s"multi-model query $name: metric names must be disjoint across parts")
  }

  /** `entity__dim` (possibly multi-hop) references inside a SQL
    * fragment (metric filters — MetricFlow's
    * `where: Dimension('customer__customer_type') = …`), restricted to
    * tokens whose FIRST segment is a declared entity so ordinary
    * double-underscore identifiers never false-positive. Quoted string
    * literals are blanked first: a literal like 'customer__x' inside a
    * filter must not trigger a spurious entity-join (ADVICE r17).
    * Returns full tokens, deduped, token order. */
  private val EntityDimToken =
    """([A-Za-z_][A-Za-z0-9_]*?)__([A-Za-z_][A-Za-z0-9_]*)""".r
  private val QuotedLiteral = """'(?:[^'']|'')*'""".r
  def entityDimRefs(sql: String, declaredEntities: Set[String]): Seq[String] = {
    val bare = QuotedLiteral.replaceAllIn(sql, "''")
    EntityDimToken.findAllMatchIn(bare)
      .filter(m => declaredEntities.contains(m.group(1)))
      .map(_.matched)
      .toSeq.distinct
  }
}
