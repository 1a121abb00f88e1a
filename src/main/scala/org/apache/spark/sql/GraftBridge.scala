package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed the public `new Column(Expression)` constructor; the
  * supported conversion lives in `org.apache.spark.sql.classic.ExpressionUtils`
  * which is `private[sql]`. This bridge (compiled into the sql package, the
  * standard pattern for Spark extension libraries) re-exports the two
  * conversions graft's custom Catalyst expressions need.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
