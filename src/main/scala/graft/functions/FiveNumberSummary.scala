package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Exact five-number summary (min, Q1, median, Q3, max) in ONE aggregation
  * buffer.
  *
  * The reference computes the five numbers as five separate aggregate
  * expressions (flood/spark/transforms.py:138-148); in exact mode that is
  * three independent `Percentile` aggregates, each buffering every group
  * value in its own counts-map, plus min and max. This
  * `TypedImperativeAggregate` buffers each value once and derives all five
  * statistics from a single sort at eval time — same values
  * (Hyndman–Fan type-7 interpolation, the formula Spark's `percentile`
  * and DuckDB's `quantile_cont` share), one fifth the aggregation state.
  *
  * Like any exact percentile it buffers per-group values — the mergeable
  * `percentile_approx` sketch remains the 100 TB default
  * ([[graft.transforms.ThresholdPercentages.Approx]]); this is the
  * oracle-parity exact path done efficiently.
  * Equality with the five-aggregate formulation is pinned by
  * FiveNumberSummarySpec over the real flood-shaped data.
  */
case class FiveNumberSummary(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = FiveNumberSummary.OutputType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"five_number_summary requires a numeric argument, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): ArrayBuffer[Double] = ArrayBuffer.empty[Double]

  override def update(buf: ArrayBuffer[Double], input: InternalRow): ArrayBuffer[Double] = {
    val v = child.eval(input)
    if (v != null) buf += (v match {
      case d: Double => d
      case f: Float => f.toDouble
      case d: Decimal => d.toDouble // Decimal is not a java.lang.Number
      case n: Number => n.doubleValue()
    })
    buf
  }

  override def merge(buf: ArrayBuffer[Double], other: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    buf ++= other
    buf
  }

  override def eval(buf: ArrayBuffer[Double]): Any = {
    if (buf.isEmpty) return null
    val sorted = buf.toArray
    java.util.Arrays.sort(sorted)
    // Hyndman–Fan type 7, replicating Spark Percentile.getPercentile's
    // exact FP arithmetic (weighted sum, equal-key short-circuit) so this
    // mode is bit-identical to the three-percentile formulation
    def q(p: Double): Double = {
      val position = (sorted.length - 1).toDouble * p
      val lower = math.floor(position).toLong
      val higher = math.ceil(position).toLong
      val lowerVal = sorted(lower.toInt)
      val higherVal = sorted(higher.toInt)
      if (higher == lower || higherVal == lowerVal) lowerVal
      else (higher - position) * lowerVal + (position - lower) * higherVal
    }
    new GenericInternalRow(Array[Any](sorted(0), q(0.25), q(0.5), q(0.75), sorted(sorted.length - 1)))
  }

  override def serialize(buf: ArrayBuffer[Double]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(buf.length * 8 + 4)
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.length)
    buf.foreach(out.writeDouble)
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[Double](n)
    var i = 0
    while (i < n) { buf += in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FiveNumberSummary =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FiveNumberSummary =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object FiveNumberSummary {
  val OutputType: StructType = StructType(Seq(
    StructField("min", DoubleType, nullable = false),
    StructField("q1", DoubleType, nullable = false),
    StructField("median", DoubleType, nullable = false),
    StructField("q3", DoubleType, nullable = false),
    StructField("max", DoubleType, nullable = false)))

  /** Aggregate Column: one buffer, five statistics. */
  def apply(value: Column): Column =
    ColumnBridge.column(
      new FiveNumberSummary(ColumnBridge.expression(value)).toAggregateExpression())
}
