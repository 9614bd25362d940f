package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4 split
  * Column from catalyst Expression; `ExpressionUtils` is the sanctioned
  * classic-backend converter but is sql-private). Lives under
  * `org.apache.spark.sql` solely to cross that boundary — keep this file
  * to these two forwarders. */
object GraftSqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** True iff `df` is a lazy localCheckpoint whose backing RDD has
    * already materialized. Concurrent FIRST-touch of an unmaterialized
    * checkpoint races on its SQL-metric accumulators ("attempted to
    * access non-existent accumulator"), so callers that fan actions out
    * across threads force any frame this returns false for. Returns
    * false for non-checkpoint frames (conservative: a force is always
    * safe, skipping one is not). `LogicalRDD` is `private[sql]`, hence
    * this lives in the shim. */
  def isMaterializedLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.isCheckpointed
      case _ => false
    }
}
