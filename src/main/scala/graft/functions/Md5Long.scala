package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Bytes 8..15 of `md5(child)` read big-endian as a signed 64-bit integer,
  * computed DIRECTLY from the digest — no hex round-trip.
  *
  * This is the engine's base hash for the whole near-dup family (one md5
  * per shingle/frame/gram, lanes derived by [[WrapMulAdd]]), so its
  * per-evaluation cost multiplies by corpus token count. The composed form
  * (`conv(substring(md5(c), 17, 16), 16, -10)`) materializes three strings
  * per evaluation — the 32-char hex digest, the 16-char substring, and the
  * parse — all thrown away immediately; this expression folds the eight
  * digest bytes into the long in place. Value-identical to the composed
  * form by construction (FunctionsSpec pins them equal on fixtures and
  * edge cases), and externally reproducible the same way:
  * `CAST('0x' || substring(md5(x), 17, 16) AS UBIGINT)` two's-complement
  * mapped to BIGINT (the DuckDB oracle twin, [[graft.queries.Documents
  * .signedBeMd5Sql]]).
  *
  * The MessageDigest instance is thread-local (task threads reuse it;
  * `digest()` resets internally) and the codegen path calls the same
  * static helper the interpreted path uses — one tight call in the
  * generated loop, no per-row allocation beyond the digest's own output.
  */
case class Md5Long(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes a BINARY child (cast strings explicitly), got " +
        child.dataType.catalogString)

  override protected def nullSafeEval(input: Any): Any =
    Md5Long.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the companion object instance — resilient to how Janino
    // resolves Scala object static forwarders
    val helper = ctx.addReferenceObj("md5LongHelper", Md5Long,
      "graft.functions.Md5Long$")
    defineCodeGen(ctx, ev, c => s"$helper.hash($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Long =
    copy(child = newChild)
}

object Md5Long {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Bytes 8..15 of md5(bytes), big-endian, as a signed long. */
  def hash(bytes: Array[Byte]): Long = {
    val d = md.get().digest(bytes)
    var acc = 0L
    var i = 8
    while (i < 16) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc
  }

  /** Column entry: accepts string or binary (strings hash their UTF-8
    * bytes — the same implicit cast the builtin `md5()` applies).
    */
  def apply(c: Column): Column =
    ColumnShim.column(Md5Long(ColumnShim.expression(c.cast("binary"))))
}
