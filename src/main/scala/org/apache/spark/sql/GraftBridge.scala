package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Public bridge to the `private[sql]` Column <-> Expression converters
  * (the standard technique third-party Spark extensions use to expose
  * custom Catalyst expressions as user-facing Columns on Spark 4.x).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over a custom relation plan (private[sql] Dataset.ofRows);
    * used to expose the qtable's stats-skipping FileIndex as a plain
    * declarative DataFrame. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
