package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

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
}
