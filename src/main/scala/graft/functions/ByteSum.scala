package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Sum of the UNSIGNED byte values of `child`, as a long — the frame
  * "brightness" reduction of the multimodal family (m8's shot-boundary
  * proxy), evaluated once per sampled frame, so its cost multiplies by
  * corpus frame count exactly like [[Md5Long]]'s multiplies by token
  * count.
  *
  * The composed form
  * (`aggregate(transform(sequence(1, n), i -> ascii(substring(c, i, 1))), ...)`)
  * materializes n single-char strings per frame and walks two
  * interpreted higher-order lambdas; this expression is one codegen'd
  * loop over the bytes in place. For pure-ASCII payloads it is
  * value-identical to the per-character `ascii` fold (every byte IS the
  * code point — the same ASCII coupling m2/m3 document for their
  * oracles); for general binary payloads it is the natural definition
  * (a real luma histogram slots into the same seam).
  */
case class ByteSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "byte_sum"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes a BINARY child (cast strings explicitly), got " +
        child.dataType.catalogString)

  override protected def nullSafeEval(input: Any): Any =
    ByteSum.sum(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("byteSumHelper", ByteSum,
      "graft.functions.ByteSum$")
    defineCodeGen(ctx, ev, c => s"$helper.sum($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): ByteSum =
    copy(child = newChild)
}

object ByteSum {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim

  def sum(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) { acc += (bytes(i) & 0xffL); i += 1 }
    acc
  }

  /** Column entry: accepts string or binary (strings sum their UTF-8
    * bytes — the same implicit cast the builtin `md5()` applies).
    */
  def apply(c: Column): Column =
    ColumnShim.column(ByteSum(ColumnShim.expression(c.cast("binary"))))
}
