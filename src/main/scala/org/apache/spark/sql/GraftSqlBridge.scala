package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the [sql]-private Column<->Expression conversions so graft
  * can expose native Catalyst expressions as `Column`s (Spark 4 removed the
  * public `new Column(expr)` constructor). Lives in this package on purpose
  * — the classic converters are `private[sql]`. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
