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
  *  - `md5_long(bin)`: the near-dup family's base hash (md5 bytes 8..15,
  *    big-endian, signed) — see [[graft.functions.Md5Long]];
  *  - `byte_sum(bin)`: unsigned-byte-value sum, the multimodal frame
  *    "brightness" reduction — see [[graft.functions.ByteSum]];
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

  /** A 2-arg builder that fails ANALYSIS (not IndexOutOfBounds from
    * inside the registry) on wrong arity.
    */
  private def binary(name: String)(
      mk: (Expression, Expression) => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != 2)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> "2",
            "actualNum" -> args.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      mk(args(0), args(1))
    }

  /** A 1-arg builder with the same fail-at-analysis arity contract. */
  private def unary(name: String)(
      mk: Expression => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != 1)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> "1",
            "actualNum" -> args.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      mk(args(0))
    }

  val descriptors: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("arg_max_row",
      info("arg_max_row", "_FUNC_(ordering, payload) - payload of the row with max ordering"),
      binary("arg_max_row")(ArgMaxRow(_, _))),
    ("vec_dot_fold",
      info("vec_dot_fold", "_FUNC_(a, b) - sequential-left-fold dot product of two arrays"),
      binary("vec_dot_fold")(VecDotFold(_, _))),
    ("md5_long",
      info("md5_long", "_FUNC_(bin) - bytes 8..15 of md5(bin), big-endian, as a signed BIGINT"),
      unary("md5_long")(graft.functions.Md5Long(_))),
    ("byte_sum",
      info("byte_sum", "_FUNC_(bin) - sum of the unsigned byte values, as a BIGINT"),
      unary("byte_sum")(graft.functions.ByteSum(_))))

  /** Register the functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, i, b) => FunctionShim.register(spark, name, i, b) }
}
