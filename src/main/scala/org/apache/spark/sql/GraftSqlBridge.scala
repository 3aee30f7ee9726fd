package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to `private[sql]` Column/Expression conversions — the
  * supported way for third-party libraries to lift a custom Catalyst
  * `Expression` into the public `Column` API on Spark 4.
  */
object GraftSqlBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
