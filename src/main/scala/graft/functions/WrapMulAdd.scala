package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `x * a + b` on the 64-bit two's-complement ring (Java wrapping
  * semantics), as a Catalyst expression.
  *
  * Needed because ANSI mode (the engine default) makes `*`/`+` THROW on
  * long overflow, but universal-hash families ("h*a+b mod 2^64") depend
  * on wraparound. With `a` odd this is a bijection of the ring — the
  * cheap way to derive many MinHash lanes from ONE base md5 instead of
  * hashing every shingle once per lane. Reproducible externally as
  * `(HUGEINT(u) * a + b) % 2^64` on the unsigned view (DuckDB oracle).
  */
case class WrapMulAdd(child: Expression, a: Long, b: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "wrap_mul_add"

  // fail at ANALYSIS on a non-long child: without this, interpreted eval
  // (incl. ConstantFolding) ClassCastExceptions while codegen silently
  // promotes — the same plan crashing or succeeding by eval path
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName wraps on the 64-bit ring and takes a BIGINT child, " +
        s"got ${child.dataType.catalogString}")

  override protected def nullSafeEval(x: Any): Any =
    x.asInstanceOf[Long] * a + b // Java long arithmetic wraps

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$c * ${a}L + ${b}L")

  override protected def withNewChildInternal(newChild: Expression): WrapMulAdd =
    copy(child = newChild)
}

object WrapMulAdd {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim

  def apply(c: Column, a: Long, b: Long): Column =
    ColumnShim.column(WrapMulAdd(ColumnShim.expression(c), a, b))

  /** Driver-side twin (Scala Long arithmetic wraps identically). */
  def local(x: Long, a: Long, b: Long): Long = x * a + b
}
