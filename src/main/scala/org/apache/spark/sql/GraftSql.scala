package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4.x moved
  * `new Column(expr)` behind `org.apache.spark.sql.classic.ExpressionUtils`).
  * Lives in `org.apache.spark.sql` solely to re-export those two calls for
  * graft's custom Catalyst expressions.
  */
object GraftSql {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
