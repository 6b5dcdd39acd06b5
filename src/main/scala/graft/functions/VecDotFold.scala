package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product of two numeric arrays as a SEQUENTIAL left fold in
  * double, whole-stage-codegen'd: the generated code is one tight loop
  * over the two ArrayData buffers instead of an interpreted lambda per
  * element allocating intermediate arrays.
  *
  * Precision contract: each element is widened to DOUBLE BEFORE the
  * multiply. For `array<double>` inputs (every in-repo call site — the
  * queries cast embeddings up front) this is bit-identical to
  * `aggregate(zip_with(a,b,*), 0d, +)` and to DuckDB's `list_reduce`
  * over a DOUBLE[] list. For `array<float>` inputs it is deliberately
  * NOT the lambda form (which would round each product to float first):
  * the widened fold is the numerically better one, but an oracle built
  * from the float-lambda formulation will differ in the low bits — cast
  * to double on both sides, as the queries do.
  *
  * This is the engine's hot scalar for similarity search (SURVEY §2.11):
  * brute-force cosine is O(Q x N x D) dot products, so at 100 TB the
  * per-element interpreter overhead IS the query cost.
  *
  * Null/length semantics match the lambda formulation: mismatched lengths
  * or a null element yield NULL (zip_with pads with null, null poisons the
  * float sum).
  */
case class VecDotFold(left: Expression, right: Expression)
  extends BinaryExpression {

  private def okType(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _                                    => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left) && okType(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot_fold"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = elemIsFloat(left); val yf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getA = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      // numElements() hoisted: a virtual call per element in the hottest
      // scalar (O(Q x N x D) dot products) is pure overhead, and Spark's
      // own array codegen hoists the same way
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  int $i = 0;
         |  for (; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $getA * $getB;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotFold =
    copy(left = newLeft, right = newRight)
}

object VecDotFold {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-API entry: sequential-fold dot product. */
  def dot(a: Column, b: Column): Column =
    ColumnShim.column(VecDotFold(ColumnShim.expression(a), ColumnShim.expression(b)))
}
