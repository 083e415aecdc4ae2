package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic backend's Column ⇄ Expression conversion, which
  * is `private[sql]` in Spark 4 (org.apache.spark.sql.classic
  * .ExpressionUtils). Needed to expose custom Catalyst expressions
  * (graft.functions.*) as user-facing Columns.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
