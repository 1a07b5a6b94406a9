package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> Expression converters.
  * Spark 4 removed the public `new Column(expr)` constructor (the Connect
  * refactor routes columns through ColumnNode); libraries that define native
  * Catalyst expressions reach the classic converter from inside the
  * org.apache.spark.sql package instead. This is the only file in the repo
  * living outside the graft namespace, and it contains no logic.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
