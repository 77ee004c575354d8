package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StructField, StructType}

/** Mutable argmax state: the current greatest ordering tuple (copied out
  * of the reused input row) or unset. */
final class ArgMaxRowState(var set: Boolean, var values: Array[Any])

/** [[ArgMaxRow]] for VAR-LENGTH payloads (strings, arrays): the same
  * "row-payload of the lexicographic maximum" contract, as a
  * `TypedImperativeAggregate` so the plan takes the
  * `ObjectHashAggregateExec` path.
  *
  * [[ArgMaxRow]]'s scalar-slot buffer restores `HashAggregateExec`, but
  * only for UnsafeRow-MUTABLE slot types (fixed-width primitives) — a
  * string field in the buffer forces the same `SortAggregateExec`
  * fallback the struct buffer did, which is exactly the
  * latest-row-per-key shape of [[graft.operators.SnapshotMerge]] (string
  * payload columns). This variant keeps the buffer as a plain JVM object
  * (`ArgMaxRowState`), so the aggregation hash map updates in place for
  * ANY field type and the input is never sorted on either side of the
  * exchange. (`ObjectHashAggregateExec` itself degrades gracefully to
  * sort-based processing past `spark.sql.objectHashAggregate.sortBased
  * .fallbackThreshold` in-memory groups — a runtime spill decision per
  * partition, not the plan-level both-sides sort of `SortAggregateExec`.)
  *
  * Comparison semantics are `max(struct(...))`'s: the interpreted struct
  * ordering (null fields smallest, NaN greatest, lexicographic) over the
  * ordering tuple. Strictly-greater adoption makes ties first-wins, which
  * is deterministic only when the full ordering tuple is a total key —
  * [[graft.operators.SnapshotMerge.latestPerKey]] appends the whole
  * payload to the tuple, so equal tuples are identical rows and the pick
  * is always deterministic.
  *
  * Use [[ArgMaxRow.auto]] to select between the two variants by type.
  */
case class ArgMaxRowAny(
    ordering: Seq[Expression],
    outFields: Seq[(String, Int)],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArgMaxRowState] {

  require(ordering.nonEmpty, "argmax_row needs at least one ordering field")
  require(outFields.nonEmpty && outFields.forall { case (_, i) =>
    i >= 0 && i < ordering.length }, "outFields must index into ordering")

  override def children: Seq[Expression] = ordering
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ordering = newChildren)
  override def nullable: Boolean = true
  override def prettyName: String = "argmax_row_any"
  override def dataType: DataType = StructType(outFields.map { case (n, i) =>
    StructField(n, ordering(i).dataType, nullable = ordering(i).nullable) })

  private lazy val tupleType = StructType(ordering.zipWithIndex.map {
    case (e, i) => StructField(s"f$i", e.dataType, nullable = true) })

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(tupleType, prettyName)

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(tupleType)

  override def createAggregationBuffer(): ArgMaxRowState =
    new ArgMaxRowState(false, null)

  override def update(buf: ArgMaxRowState, input: InternalRow): ArgMaxRowState = {
    val n = ordering.length
    val cand = new Array[Any](n)
    var i = 0
    while (i < n) {
      val v = ordering(i).eval(input)
      // copy: var-length values point into the reused input row's memory
      cand(i) = if (v == null) null else InternalRow.copyValue(v)
      i += 1
    }
    if (!buf.set ||
      ord.compare(new GenericInternalRow(cand), new GenericInternalRow(buf.values)) > 0) {
      buf.set = true
      buf.values = cand
    }
    buf
  }

  override def merge(buf: ArgMaxRowState, other: ArgMaxRowState): ArgMaxRowState = {
    if (other.set && (!buf.set ||
      ord.compare(new GenericInternalRow(other.values), new GenericInternalRow(buf.values)) > 0)) {
      buf.set = true
      buf.values = other.values
    }
    buf
  }

  override def eval(buf: ArgMaxRowState): Any =
    if (!buf.set) null
    else new GenericInternalRow(outFields.map { case (_, i) => buf.values(i) }.toArray)

  // ---- shuffle format: one UnsafeRow (set flag + the ordering tuple) ----

  @transient private lazy val serSchema =
    StructType(StructField("set", BooleanType, nullable = false) +: tupleType.fields)
  @transient private lazy val serProj = UnsafeProjection.create(serSchema)

  override def serialize(buf: ArgMaxRowState): Array[Byte] = {
    val n = ordering.length
    val row = new GenericInternalRow(1 + n)
    row.update(0, buf.set)
    if (buf.set) {
      var i = 0
      while (i < n) { row.update(1 + i, buf.values(i)); i += 1 }
    }
    serProj(row).getBytes
  }

  override def deserialize(bytes: Array[Byte]): ArgMaxRowState = {
    val n = ordering.length
    val row = new UnsafeRow(1 + n)
    row.pointTo(bytes, bytes.length)
    if (!row.getBoolean(0)) new ArgMaxRowState(false, null)
    else {
      val arr = new Array[Any](n)
      var i = 0
      while (i < n) {
        arr(i) =
          if (row.isNullAt(1 + i)) null
          // copy: the UnsafeRow's backing bytes are this method's argument,
          // which the caller may recycle
          else InternalRow.copyValue(row.get(1 + i, tupleType(i).dataType))
        i += 1
      }
      new ArgMaxRowState(true, arr)
    }
  }

  override def withNewMutableAggBufferOffset(offset: Int): ArgMaxRowAny =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ArgMaxRowAny =
    copy(inputAggBufferOffset = offset)
}

object ArgMaxRowAny {
  /** Column-API wrapper. */
  def apply(ordering: Seq[Column], outFields: Seq[(String, Int)])(implicit d: DummyImplicit): Column =
    ColumnBridge.column(
      new ArgMaxRowAny(ordering.map(ColumnBridge.expression), outFields)
        .toAggregateExpression())
}
