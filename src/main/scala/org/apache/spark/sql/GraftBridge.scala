package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` Column↔Expression conversion (the Spark 4
  * Connect refactor hid `Column.expr` behind
  * `org.apache.spark.sql.classic.ExpressionUtils`). Standard pattern for
  * libraries registering custom Catalyst expressions without a
  * SparkSessionExtensions round-trip.
  */
object GraftBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** DataFrame over a hand-built logical plan (custom operator nodes) —
    * the `Dataset.ofRows` factory Spark keeps `private[sql]`.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (custom-node inputs). */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
