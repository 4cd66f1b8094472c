package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Evidence that the declarative staging layer keeps Catalyst's scan
  * optimizations intact: a narrow projection prunes the parquet
  * ReadSchema to the referenced physical columns, and a filter on a
  * renamed column pushes down to the scan as a data filter on the
  * underlying parquet column.
  */
class ScanPruningSpec extends SparkSpec {

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(fail("no FileSourceScanExec in plan"))

  test("column pruning: 2-column projection reads 2 physical columns") {
    // stg_orders derives order_id from o_orderkey and order_total from
    // o_totalprice; selecting them must not read the other 7 columns.
    val df = Models.stgOrders(spark, sf).select("order_id", "order_total")
    val read = scanOf(df).requiredSchema.fieldNames.toSet
    assert(read === Set("o_orderkey", "o_totalprice"))
  }

  test("filter pushdown: renamed-column predicate reaches the scan") {
    val df = Models.stgOrders(spark, sf)
      .filter(col("order_id") === 42L).select("order_id")
    val pushed = scanOf(df).dataFilters.mkString(",")
    assert(pushed.contains("o_orderkey"), s"filter not pushed: $pushed")
  }

  test("curation queries prune the documents scan to the columns they use") {
    // pii_redaction touches only (doc_id, text) of the 5-column table;
    // domain_mixture only (doc_id, lang). A scan reading all columns
    // would ship n_chars/source/lang bytes through every executor for
    // nothing — at 100 TB the pruned ReadSchema IS the operator's cost.
    val redact = scanOf(Models.piiRedaction(spark, sf))
    assert(redact.requiredSchema.fieldNames.toSet === Set("doc_id", "text"))
    // domain_mixture shuffles, so its plan is AQE-wrapped (scans
    // invisible to a children traversal) — audit it with AQE off
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val mix = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Models.domainMixture(spark, sf).queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s.requiredSchema.fieldNames.toSet }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    // three scans: the row side reads (doc_id, lang); the count and
    // total branches prune further, to lang alone
    assert(mix.nonEmpty && mix.forall(_.subsetOf(Set("doc_id", "lang"))), mix.toString)
    val chunks = scanOf(Models.docChunks(spark, sf))
    assert(chunks.requiredSchema.fieldNames.toSet === Set("doc_id", "text"))
  }

  test("round-6 text queries prune the documents scan to (doc_id, text)") {
    // bigram surprisal and vocab coverage read only the text; a scan
    // shipping lang/source/n_chars would be pure waste at corpus scale
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val scans = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Seq(
        llm.Relevance.bigramSurprisal(Tables.documents(spark, sf)),
        llm.TextStats.vocabCoverage(Tables.documents(spark, sf)))
        .flatMap(_.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec
            if s.requiredSchema.fieldNames.contains("text") ||
              s.requiredSchema.fieldNames.contains("doc_id") =>
            s.requiredSchema.fieldNames.toSet
        })
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    assert(scans.nonEmpty && scans.forall(_.subsetOf(Set("doc_id", "text"))),
      scans.toString)
  }

  test("media pipeline prunes the documents scan to (doc_id, text, n_chars)") {
    // the media catalog derives modality from doc_id, content from
    // md5(text), duration from n_chars — lang/source must not ship
    // through the decode stage at corpus scale. The decode runs
    // through a typed mapPartitions (a plan barrier), but the scan
    // below it must still be pruned by the mediaTable projection.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val scans = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Seq(
        llm.Multimodal.mediaFeatures(spark, Tables.documents(spark, sf)),
        llm.Multimodal.mediaResized(spark, Tables.documents(spark, sf)),
        llm.Multimodal.mediaFrames(Tables.documents(spark, sf)))
        .flatMap(_.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec => s.requiredSchema.fieldNames.toSet
        })
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    assert(scans.nonEmpty &&
      scans.forall(_.subsetOf(Set("doc_id", "text", "n_chars"))), scans.toString)
  }
}
