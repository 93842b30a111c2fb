package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 moved `Column` to a connect-agnostic
  * API without an `expr` accessor; the classic converter is private[sql],
  * so custom Catalyst expressions need this one-hop shim (the standard
  * pattern for out-of-tree Spark extensions).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
