package graft

import graft.functions.{ArgMaxRow, VecDotFold}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.FunctionShim

/** Session extensions: expose the engine's custom Catalyst expressions and
  * analysis rules to SQL users. Install at build time
  * (`.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`); for an already-built session
  * [[GraftExtensions.register]] installs the functions (analysis rules
  * cannot be added to a live session — Spark fixes the analyzer at
  * session construction).
  *
  *  - `arg_max_row(ordering, payload)`: hash-friendly argmax aggregate
  *    (the ReplacingMergeTree-FINAL primitive) — see
  *    [[graft.functions.ArgMaxRow]];
  *  - `vec_dot_fold(a, b)`: codegen'd sequential-fold dot product for
  *    similarity search — see [[graft.functions.VecDotFold]];
  *  - [[graft.plans.ReplicaFinalRule]]: rewrites catalog scans of
  *    registered replica tables into their latest-version-wins read view
  *    (transparent ReplacingMergeTree-FINAL semantics).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectPostHocResolutionRule(session => graft.plans.ReplicaFinalRule(session))
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  val descriptors: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("arg_max_row",
      info("arg_max_row", "_FUNC_(ordering, payload) - payload of the row with max ordering"),
      (args: Seq[Expression]) => ArgMaxRow(args(0), args(1))),
    ("vec_dot_fold",
      info("vec_dot_fold", "_FUNC_(a, b) - sequential-left-fold dot product of two arrays"),
      (args: Seq[Expression]) => VecDotFold(args(0), args(1))))

  /** Register the functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, i, b) => FunctionShim.register(spark, name, i, b) }
}
