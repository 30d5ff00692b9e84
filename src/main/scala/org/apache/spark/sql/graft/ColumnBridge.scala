package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's private[sql] Column↔Expression conversions, needed
  * to expose custom Catalyst expressions as first-class Columns (the
  * public Column constructor from Expression was removed in Spark 4's
  * Connect-compatible API split). Lives inside the org.apache.spark.sql
  * package scope on purpose — the standard extension-library technique.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
