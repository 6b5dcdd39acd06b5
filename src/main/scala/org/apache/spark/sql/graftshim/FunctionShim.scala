package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.SparkSession

/** Bridge to the session function registry (private[sql]) so graft can
  * register its custom expressions on an ALREADY-RUNNING session — the
  * complement of [[graft.GraftExtensions]], which does the same at
  * session-build time via the public SparkSessionExtensions API.
  */
object FunctionShim {
  def register(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[SparkSession].sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}
