package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Expression ↔ Column converters.
  *
  * Catalyst `Expression` is the sanctioned extension point for custom
  * scalar functions (graft's XsdTemporalExprs), but Spark 4's public
  * `Column` wraps a ColumnNode and the classic converter lives behind
  * `private[sql]` — this shim is the minimal, conventional way for an
  * external library to plug a custom Expression into the DataFrame API.
  */
object GraftExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
