package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4.x hid Column<->Expression plumbing behind `private[sql]`; this
  * bridge (compiled into the spark.sql namespace, the standard extension
  * pattern) re-exposes it to the graft engine so custom Catalyst expressions
  * can surface as Columns.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
