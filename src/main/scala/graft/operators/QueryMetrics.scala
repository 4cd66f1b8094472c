package graft.operators

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Query-history capture — the `information_schema.query_history`
  * surface every warehouse exposes, recovered from Spark's
  * [[QueryExecutionListener]] hook: one row per completed action with
  * wall-clock duration, output rows (from the root operator's SQL
  * metrics), and the failure message if the action threw. Ops reads:
  * which pipeline stage dominates the nightly run, what regressed
  * after a deploy, which queries fail.
  *
  * The listener is passive metadata collection — per-query overhead is
  * one small record append on the driver; executors are untouched. The
  * buffer is bounded ([[MaxEntries]], oldest dropped) so a long-lived
  * session cannot leak. `history(spark)` snapshots the buffer as a
  * DataFrame for querying/persisting like any other table.
  */
object QueryMetrics {

  val MaxEntries = 10000

  final case class QueryRecord(
    funcName: String, durationMs: Long, outputRows: Long,
    succeeded: Boolean, error: String)

  private val buffer = new ConcurrentLinkedQueue[QueryRecord]()

  private def record(r: QueryRecord): Unit = {
    buffer.add(r)
    while (buffer.size > MaxEntries) buffer.poll()
  }

  private def outputRows(qe: QueryExecution): Long =
    try qe.executedPlan.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
    catch { case _: Throwable => -1L }

  private val listener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      record(QueryRecord(funcName, durationNs / 1000000L, outputRows(qe),
        succeeded = true, error = null))
    override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
      record(QueryRecord(funcName, -1L, -1L, succeeded = false,
        error = String.valueOf(e.getMessage)))
  }

  @volatile private var installed = false

  /** Idempotently attach the listener to the session. */
  def install(spark: SparkSession): Unit = synchronized {
    if (!installed) { spark.listenerManager.register(listener); installed = true }
  }

  /** Snapshot the captured history as a queryable DataFrame. */
  def history(spark: SparkSession): DataFrame = {
    import spark.implicits._
    buffer.asScala.toSeq.toDF()
  }

  /** Test hook: clear the buffer. */
  private[graft] def reset(): Unit = buffer.clear()
}
