package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII / blocklist redaction — the scrubbing pass every training-data
  * pipeline runs before text reaches a model: structured-PII regexes
  * (emails, phone numbers, IPs, SSNs) and a term blocklist, each
  * replaced with a `[LABEL]` placeholder.
  *
  * Design constraints at 100 TB:
  *  - pure per-row projection — no shuffle, no state, no UDF: every
  *    pattern is a codegen'd `regexp_replace`/`regexp_count`, so the
  *    pass pipelines inside whole-stage codegen with whatever scan or
  *    filter precedes it;
  *  - deterministic and engine-mirrorable: patterns are lookahead-free
  *    (Java regex on the Spark side, RE2 in the DuckDB oracle — RE2
  *    has no lookahead, so sticking to the common subset keeps both
  *    engines matching byte-identically);
  *  - patterns apply in declared order, MOST SPECIFIC FIRST, and each
  *    pattern's match count is taken on the text as the previous
  *    patterns' replacements stand — so `n_<label>` is exactly "how
  *    many [LABEL] placeholders this pattern inserted", and a span
  *    already claimed by a more specific pattern (an IP that would
  *    also parse as a phone number) is never double-counted.
  */
object Redaction {

  /** (label, pattern) — applied in order, most specific first (the
    * broad PHONE shape would otherwise swallow IPs and SSNs); all
    * lookahead-free. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "EMAIL" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "IP" -> "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
    "SSN" -> "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b",
    "PHONE" -> "\\+?[0-9][0-9() .-]{6,}[0-9]")

  /** `\b(t1|t2|…)\b` alternation for a dictionary blocklist. */
  def blocklistPattern(terms: Seq[String]): String = {
    require(terms.nonEmpty, "blocklist needs at least one term")
    terms.foreach(t => require(t.matches("[A-Za-z0-9_]+"),
      s"blocklist term '$t' must be alphanumeric (it is embedded in a regex)"))
    "\\b(" + terms.mkString("|") + ")\\b"
  }

  /** Adds, for each (label, pattern): `n_<label>` — the number of
    * `[LABEL]` placeholders the pattern inserted, counted on the text
    * as the PREVIOUS patterns' replacements stand — and finally
    * `redacted_text` with all replacements applied in declared order. */
  def redact(df: DataFrame, textCol: Column,
             patterns: Seq[(String, String)]): DataFrame = {
    require(patterns.map(_._1).distinct.size == patterns.size,
      "duplicate redaction labels")
    val (counted, redacted) = patterns.foldLeft((df, textCol)) {
      case ((acc, cur), (label, re)) =>
        (acc.withColumn(s"n_${label.toLowerCase}",
          regexp_count(cur, lit(re)).cast("long")),
          regexp_replace(cur, re, s"[$label]"))
    }
    counted.withColumn("redacted_text", redacted)
  }

  /** Blocklist used by the registered `pii_redaction` query: the
    * driver's synthetic corpus carries no real PII, so the dictionary
    * arm is what exercises non-trivial replacement there (the regex
    * arms are oracle-gated on real PII shapes by RedactionSpec). */
  val QueryBlocklist: Seq[String] = Seq("customer", "spark")

  /** Driver query: documents → per-doc PII counts + blocklist count +
    * redacted text. */
  def piiRedaction(documents: DataFrame): DataFrame = {
    val pats = PiiPatterns :+ ("TERM" -> blocklistPattern(QueryBlocklist))
    redact(documents, col("text"), pats)
      .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ip"),
        col("n_ssn"), col("n_term"), col("redacted_text"))
  }

  /** Driver query gating the REGEX arms on real PII shapes (VERDICT
    * r6 #7 — the synthetic corpus carries no PII, so `pii_redaction`
    * only ever exercises the dictionary arm): every document gets a
    * deterministic email, IP, SSN and phone number derived from its
    * doc_id, spliced around a slice of its real text, and the
    * standard [[redact]] fold runs over that. The fixture is built
    * with engine-portable string concatenation from the SAME
    * arithmetic on both sides, so the DuckDB oracle constructs the
    * identical corpus — the driver then verifies match counts AND
    * replacement output for all four patterns, including the
    * most-specific-first ordering (the SSN must be claimed before the
    * PHONE shape could swallow it). */
  def piiRedactionShapes(documents: DataFrame): DataFrame = {
    val id = col("doc_id")
    val fixture = concat(
      lit("contact user"), id, lit("@mail"), id % 10,
      lit(".example.com or 10."), id % 256, lit("."), (id * 7) % 256,
      lit("."), id % 100,
      lit(" ssn "), id % 900 + 100, lit("-"), id % 90 + 10,
      lit("-"), id % 9000 + 1000,
      lit(" call +1 555 "), id % 900 + 100, lit("-"), id % 9000 + 1000,
      lit(" :: "), substring(col("text"), 1, 40))
    redact(documents.select(id, fixture.as("text")), col("text"), PiiPatterns)
      .select(col("doc_id"), col("n_email"), col("n_ip"), col("n_ssn"),
        col("n_phone"), col("redacted_text"))
  }

  /** k-anonymity for the release audit (Sweeney): a row is
    * re-identifiable when its QUASI-IDENTIFIER combination is shared
    * by fewer than k records. */
  val KAnonymity = 5

  /** Quasi-identifier set audited over the segmentation mart — the
    * externally-correlatable attributes, not the direct keys. */
  val QuasiIds: Seq[String] =
    Seq("customer_type", "frequency_quintile", "monetary_quintile")

  /** One-row k-anonymity audit: group sizes over the quasi-identifier
    * combination, counting groups (and rows) below k — the go/no-go
    * check before releasing a "de-identified" table. Scale: one
    * keyed aggregation + one scalar rollup; nothing is pairwise. */
  def kAnonymityAudit(df: DataFrame,
                      quasiIds: Seq[String] = QuasiIds,
                      k: Int = KAnonymity): DataFrame =
    df.groupBy(quasiIds.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(
        lit(k.toLong).as("k"),
        count(lit(1)).as("n_groups"),
        count(when(col("n") < k, lit(1))).as("n_risky_groups"),
        coalesce(sum(when(col("n") < k, col("n"))), lit(0L)).as("n_risky_rows"),
        min(col("n")).as("min_group_size"))

  /** l-diversity threshold and the audited sensitive attribute. */
  val LDiversity = 2
  val SensitiveAttr = "churn_risk"

  /** One-row l-DIVERSITY audit — k-anonymity's necessary companion
    * (Machanavajjhala et al.): a group can be k-large yet leak the
    * sensitive attribute outright if every member SHARES it
    * (homogeneity attack), so each quasi-identifier group must also
    * contain ≥ l distinct sensitive values. Same one-aggregation
    * shape as [[kAnonymityAudit]]; nothing is pairwise. */
  def lDiversityAudit(df: DataFrame,
                      quasiIds: Seq[String] = QuasiIds,
                      sensitive: String = SensitiveAttr,
                      l: Int = LDiversity): DataFrame =
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("n"), countDistinct(col(sensitive)).as("ndv"))
      .agg(
        lit(l.toLong).as("l"),
        count(lit(1)).as("n_groups"),
        count(when(col("ndv") < l, lit(1))).as("n_risky_groups"),
        coalesce(sum(when(col("ndv") < l, col("n"))), lit(0L)).as("n_risky_rows"),
        min(col("ndv")).as("min_distinct_sensitive"))

  /** t-closeness threshold: a group whose sensitive-value distribution
    * sits further than t (total variation distance) from the global
    * distribution leaks by SKEW even when it is k-large and l-diverse. */
  val TCloseness = 0.2

  /** One-row t-CLOSENESS audit — the third leg of the release-audit
    * trio (Li, Li & Venkatasubramanian): [[kAnonymityAudit]] bounds
    * group SIZE, [[lDiversityAudit]] bounds sensitive CARDINALITY,
    * and this bounds sensitive-distribution DISTANCE — a group can be
    * k-large and l-diverse yet still tell an attacker "90% high churn
    * risk here vs 30% overall". For a categorical sensitive attribute
    * the earth-mover distance reduces to total variation distance
    * TVD(g) = ½·Σ_v |p_g(v) − p(v)|.
    *
    * Cross-engine determinism: the sum runs over EXACT integers —
    * |c_gv·N − c_v·n_g| (bigint; |terms| ≤ n_g·N ≤ N², overflow-safe
    * to ~3e9 rows) — and values absent from a group contribute in
    * closed form n_g·(N − Σ_{v∈g} c_v) (no group×value grid to
    * build), so exactly ONE IEEE division per group produces the
    * double TVD, and only order-independent max/count/compare touch
    * doubles after that.
    *
    * Scale: two keyed aggregations (group×value, then group) plus a
    * broadcast of the ≤|values|-row global distribution; nothing is
    * pairwise and no double is ever summed. */
  def tClosenessAudit(df: DataFrame,
                      quasiIds: Seq[String] = QuasiIds,
                      sensitive: String = SensitiveAttr,
                      t: Double = TCloseness): DataFrame = {
    val gs = quasiIds.map(col)
    // Distribution over OBSERVED sensitive values: null is "no label",
    // not a category (matches countDistinct's null-skip in the
    // l-diversity audit, and keeps the equi-join below null-safe).
    val obs = df.filter(col(sensitive).isNotNull)
    val cell = obs.groupBy(gs :+ col(sensitive): _*).agg(count(lit(1)).as("c_gv"))
    val global = obs.groupBy(col(sensitive)).agg(count(lit(1)).as("c_v"))
    val total = obs.agg(count(lit(1)).as("n_total"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(gs: _*)
    val perGroup = cell
      .join(broadcast(global), sensitive)
      .crossJoin(broadcast(total))
      .withColumn("n_g", sum(col("c_gv")).over(w)) // ≤ |values| rows per group
      .groupBy(gs: _*)
      .agg(
        first(col("n_g")).as("n_g"),
        first(col("n_total")).as("n_total"),
        sum(abs(col("c_gv") * col("n_total") - col("c_v") * col("n_g")))
          .as("num_in"),
        sum(col("c_v")).as("covered_cv"))
      .withColumn("__num", // absent values' terms in closed form
        col("num_in") + col("n_g") * (col("n_total") - col("covered_cv")))
      .withColumn("tvd", col("__num").cast("double") /
        (lit(2L) * col("n_g") * col("n_total")).cast("double"))
    perGroup.agg(
      lit(t).as("t"),
      count(lit(1)).as("n_groups"),
      count(when(col("tvd") > t, lit(1))).as("n_risky_groups"),
      coalesce(sum(when(col("tvd") > t, col("n_g"))), lit(0L)).as("n_risky_rows"),
      max(col("tvd")).as("max_tvd"))
  }
}
