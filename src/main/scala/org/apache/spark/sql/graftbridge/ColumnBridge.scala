package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(Expression)` constructor; the
  * supported path for libraries registering native expressions is
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is private[sql].
  * This bridge (the conventional extension-library escape hatch) exposes
  * just the two conversions graft needs.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
