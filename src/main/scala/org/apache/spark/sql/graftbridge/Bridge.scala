package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the classic converters
  * `private[sql]` (Connect split); extensions shipping custom Catalyst
  * expressions expose them via an `org.apache.spark.sql` subpackage —
  * the same access pattern third-party Spark extension libraries use.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Stop the StateStore maintenance task (and unload loaded
    * providers) BEFORE `spark.stop()`: the scheduled maintenance
    * thread outlives the SparkEnv and its next tick prints an
    * "SparkEnv not active" IllegalStateException stack into every
    * harness artifact tail (VERDICT r15 #4a). `StateStore.stop()` is
    * `private[sql]`, hence the bridge. */
  def stopStateStoreMaintenance(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
}
