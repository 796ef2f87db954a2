package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Public bridge to the `private[sql]` Column <-> Expression converters
  * (the standard technique third-party Spark extensions use to expose
  * custom Catalyst expressions as user-facing Columns on Spark 4.x).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
