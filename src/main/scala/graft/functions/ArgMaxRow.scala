package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, CreateNamedStruct, CreateStruct, Expression, GreaterThan, If, Literal}
import org.apache.spark.sql.catalyst.expressions.{And, Not, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StructField, StructType}

/** Hash-aggregable argmax: the row-payload of the lexicographic maximum of
  * `ordering`, with every aggregation-buffer slot a SCALAR.
  *
  * `max(struct(ord..., payload))` — the obvious Spark spelling of "the row
  * with the greatest key" (used by the fused summary stage for the peak
  * row, [[graft.transforms.Summary.onePass]]) — carries a struct-typed
  * aggregation buffer, which `UnsafeRow` cannot mutate in place, so
  * `HashAggregateExec` refuses the plan and Spark falls back to
  * `SortAggregateExec`: BOTH sides of the stage's exchange sort the full
  * fact input by the grouping key before aggregating (19.3 M rows twice on
  * an operational GloFAS day; 100× that on the target corpus — and the
  * partial side's sort runs spill once a partition outgrows memory).
  *
  * This aggregate stores the SAME fields flattened into one scalar buffer
  * slot each (int/double/date — all UnsafeRow-mutable), restoring hash
  * aggregation: per-partition state is one buffer row per GROUP with O(1)
  * updates, no input sort on either side of the exchange.
  *
  * Comparison semantics are kept exactly `max(struct(...))`'s by building
  * the comparison itself on transient structs: `struct(ordering...) >
  * struct(buffer...)` uses the identical ordering (null fields smallest,
  * NaN greatest, nested lexicographic) that `Max` applies to its struct
  * buffer — the structs exist only inside the update expression's
  * codegen, never in the buffer. An explicit boolean `set` slot marks an
  * untouched buffer instead of a null sentinel, so ordering fields that
  * are legitimately null stay distinguishable.
  *
  * @param ordering  compared lexicographically ascending, greatest row wins
  * @param outFields (name, index-into-ordering) of the emitted payload
  *                  struct — payload fields participate in the ordering
  *                  (trailing tiebreak positions), matching the original
  *                  nested-struct form
  */
case class ArgMaxRow(ordering: Seq[Expression], outFields: Seq[(String, Int)])
    extends DeclarativeAggregate {

  require(ordering.nonEmpty, "argmax_row needs at least one ordering field")
  require(outFields.nonEmpty && outFields.forall { case (_, i) =>
    i >= 0 && i < ordering.length }, "outFields must index into ordering")

  override def children: Seq[Expression] = ordering

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ordering = newChildren)
  override def nullable: Boolean = true
  override def prettyName: String = "argmax_row"
  override def dataType: DataType = StructType(outFields.map { case (n, i) =>
    StructField(n, ordering(i).dataType, nullable = ordering(i).nullable) })

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(StructType(ordering.zipWithIndex.map {
      case (e, i) => StructField(s"f$i", e.dataType) }), prettyName)

  private lazy val fieldBuf: Seq[AttributeReference] =
    ordering.zipWithIndex.map { case (e, i) =>
      AttributeReference(s"argmax_f$i", e.dataType, nullable = true)() }
  private lazy val setBuf =
    AttributeReference("argmax_set", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = fieldBuf :+ setBuf

  override lazy val initialValues: Seq[Expression] =
    ordering.map(e => Literal.create(null, e.dataType)) :+ Literal(false)

  // The same `better` predicate expression tree is repeated in each of the
  // N buffer-slot update expressions. Under whole-stage codegen, common
  // subexpression elimination evaluates it ONCE per input row (the
  // intended cost); interpreted paths or runs with
  // spark.sql.subexpressionElimination.enabled=false pay the struct
  // comparison N times per row — slower, never incorrect. A dedicated
  // boolean buffer slot would make the single evaluation structural, but
  // update expressions see the PRE-update buffer, so the flag could not be
  // both written and read in one pass without reordering guarantees the
  // DeclarativeAggregate contract doesn't give.
  override lazy val updateExpressions: Seq[Expression] = {
    val better = Or(Not(setBuf), GreaterThan(CreateStruct(ordering), CreateStruct(fieldBuf)))
    fieldBuf.zip(ordering).map { case (b, e) => If(better, e, b) } :+ Literal(true)
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val rightBetter = And(
      setBuf.right,
      Or(Not(setBuf.left),
        GreaterThan(CreateStruct(fieldBuf.map(_.right)), CreateStruct(fieldBuf.map(_.left)))))
    fieldBuf.map(b => If(rightBetter, b.right, b.left)) :+ Or(setBuf.left, setBuf.right)
  }

  override lazy val evaluateExpression: Expression =
    If(setBuf,
      CreateNamedStruct(outFields.flatMap { case (n, i) =>
        Seq(Literal(n), fieldBuf(i)) }),
      Literal.create(null, dataType))
}

object ArgMaxRow {
  /** Column-API wrapper: `argMaxRow(Seq(ordCols), Seq(name -> idx))`. */
  def apply(ordering: Seq[Column], outFields: Seq[(String, Int)])(implicit d: DummyImplicit): Column =
    ColumnBridge.column(
      new ArgMaxRow(ordering.map(ColumnBridge.expression), outFields).toAggregateExpression())
}
