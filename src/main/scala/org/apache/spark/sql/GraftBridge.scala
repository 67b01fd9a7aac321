package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column <-> Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Spark 4 routes Column
  * through ColumnNode; this is the supported-classic path extension
  * libraries use to wrap custom Catalyst expressions as user-facing
  * Columns.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
