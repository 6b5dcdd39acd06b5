package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Aggregation buffer: the best ordering value seen and its payload row. */
final class ArgMaxBuffer(var ord: Any, var row: InternalRow)

/** Hash-friendly `max_by`: returns the `payload` (a struct) of the row with
  * the greatest `ordering` value.
  *
  * Why not the built-in `max_by`? Its declarative buffer holds the payload
  * struct, and HashAggregateExec only supports fixed-width mutable buffer
  * types — so `max_by(struct(...), ver)` silently degrades to
  * SortAggregate: a full per-partition sort on BOTH the partial and final
  * stages. For the engine's hottest operator (the ReplacingMergeTree
  * read view collapsing billions of rows) that is a spilling sort at
  * 100 TB. As a TypedImperativeAggregate this runs on
  * ObjectHashAggregateExec: hash-based grouping with map-side partial
  * aggregation, graceful fallback to sorting only under memory pressure.
  *
  * Semantics match `max_by` (last-write-wins on ties is avoided by giving
  * a total-order `ordering`, e.g. struct(ver, tieBreak...)); rows with a
  * NULL ordering are ignored.
  */
case class ArgMaxRow(
    ordering: Expression,
    payload: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArgMaxBuffer] with BinaryLike[Expression] {

  override def left: Expression = ordering
  override def right: Expression = payload
  override def dataType: DataType = payload.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "arg_max_row"

  // the SQL surface (GraftExtensions) accepts arbitrary expressions —
  // guard the struct contract instead of ClassCastException-ing at update
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    payload.dataType match {
      case _: StructType
        if org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(ordering.dataType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _: StructType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName ordering type ${ordering.dataType.catalogString} is not orderable")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName payload must be a struct, got ${other.catalogString}")
    }

  @transient private lazy val ord =
    TypeUtils.getInterpretedOrdering(ordering.dataType)

  override def createAggregationBuffer(): ArgMaxBuffer = new ArgMaxBuffer(null, null)

  override def update(b: ArgMaxBuffer, input: InternalRow): ArgMaxBuffer = {
    val o = ordering.eval(input)
    if (o != null && (b.ord == null || ord.compare(o, b.ord) > 0)) {
      val p = payload.eval(input) // nullable struct column -> null payload
      b.ord = InternalRow.copyValue(o)
      b.row = if (p == null) null else p.asInstanceOf[InternalRow].copy()
    }
    b
  }

  override def merge(b1: ArgMaxBuffer, b2: ArgMaxBuffer): ArgMaxBuffer =
    if (b2.ord != null && (b1.ord == null || ord.compare(b2.ord, b1.ord) > 0)) b2 else b1

  override def eval(b: ArgMaxBuffer): Any = b.row

  @transient private lazy val serdeProj = UnsafeProjection.create(StructType(Seq(
    StructField("o", ordering.dataType), StructField("p", payload.dataType))))
  @transient private lazy val payloadFields =
    payload.dataType.asInstanceOf[StructType].length

  override def serialize(b: ArgMaxBuffer): Array[Byte] =
    if (b.ord == null) Array.emptyByteArray
    else serdeProj(InternalRow(b.ord, b.row)).getBytes

  override def deserialize(bytes: Array[Byte]): ArgMaxBuffer =
    if (bytes.isEmpty) new ArgMaxBuffer(null, null)
    else {
      val row = new UnsafeRow(2)
      row.pointTo(bytes, bytes.length)
      new ArgMaxBuffer(
        InternalRow.copyValue(row.get(0, ordering.dataType)),
        if (row.isNullAt(1)) null else row.getStruct(1, payloadFields).copy())
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArgMaxRow =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArgMaxRow =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMaxRow =
    copy(ordering = newLeft, payload = newRight)
}
