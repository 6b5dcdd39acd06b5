package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column<->Expression converters, so
  * graft can hand custom Catalyst expressions (e.g.
  * [[graft.functions.ArgMaxRow]]) to the public DataFrame API. Same
  * technique every Spark extension library uses; no Spark internals are
  * modified.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
