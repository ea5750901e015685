package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surface: wrap a Catalyst Expression into a
  * public Column (Spark 4.x hides the Column(expr) constructor behind
  * `classic.ExpressionUtils`). This is the only file outside the `graft`
  * namespace. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
