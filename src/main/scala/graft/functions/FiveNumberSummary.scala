package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Growable PRIMITIVE double buffer for [[FiveNumberSummary]].
  * `ArrayBuffer[Double]` stores boxed `java.lang.Double`s (Scala
  * collections hold AnyRef), which at fact scale means one heap
  * allocation per aggregated VALUE — 985 M boxes on a full GloFAS day —
  * plus 3× the state bytes. This is the unboxed equivalent: an
  * amortized-doubling `Array[Double]`, sized for the ≤51-member ensemble
  * groups it usually holds. */
private[functions] final class DoubleBuffer(
    private var arr: Array[Double], private var n: Int) {
  def this() = this(new Array[Double](16), 0)
  def size: Int = n
  def isEmpty: Boolean = n == 0
  def apply(i: Int): Double = arr(i)

  /** Grow to hold at least `min` values. Fails loudly near 2^31 values
    * (a degenerate grouping, e.g. a key bug putting >2 B rows in one
    * group) instead of the silent spin/negative-size an unchecked
    * doubling loop produces on Int overflow. */
  private def ensureCapacity(min: Int): Unit = {
    require(min >= 0,
      "five_number_summary buffer exceeds 2^31 values in one group — " +
        "this group is degenerate; check the grouping keys")
    if (min > arr.length) {
      var cap = arr.length.max(1)
      while (cap < min && cap > 0) cap <<= 1
      if (cap < min) cap = Int.MaxValue - 8 // last representable step
      arr = java.util.Arrays.copyOf(arr, cap)
    }
  }

  def add(v: Double): Unit = {
    ensureCapacity(n + 1)
    arr(n) = v
    n += 1
  }

  def addAll(o: DoubleBuffer): Unit = {
    ensureCapacity(n + o.n)
    System.arraycopy(o.arr, 0, arr, n, o.n)
    n += o.n
  }

  /** The held values, sorted, as a fresh exact-length array. */
  def sortedCopy: Array[Double] = {
    val out = java.util.Arrays.copyOf(arr, n)
    java.util.Arrays.sort(out)
    out
  }
}

/** Exact five-number summary (min, Q1, median, Q3, max) in ONE aggregation
  * buffer.
  *
  * The reference computes the five numbers as five separate aggregate
  * expressions (flood/spark/transforms.py:138-148); in exact mode that is
  * three independent `Percentile` aggregates, each buffering every group
  * value in its own counts-map, plus min and max. This
  * `TypedImperativeAggregate` buffers each value once — in a PRIMITIVE
  * [[DoubleBuffer]], no per-value boxing — and derives all five
  * statistics from a single sort at eval time — same values
  * (Hyndman–Fan type-7 interpolation, the formula Spark's `percentile`
  * and DuckDB's `quantile_cont` share), a fraction of the aggregation
  * state (Spark's own `Percentile` buffers an OpenHashMap of boxed
  * counts per group, ×3 for three quantiles).
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
  extends TypedImperativeAggregate[DoubleBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = FiveNumberSummary.OutputType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"five_number_summary requires a numeric argument, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): DoubleBuffer = new DoubleBuffer()

  override def update(buf: DoubleBuffer, input: InternalRow): DoubleBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case d: Decimal => d.toDouble // Decimal is not a java.lang.Number
      case n: Number => n.doubleValue()
    })
    buf
  }

  override def merge(buf: DoubleBuffer, other: DoubleBuffer): DoubleBuffer = {
    buf.addAll(other)
    buf
  }

  override def eval(buf: DoubleBuffer): Any = {
    if (buf.isEmpty) return null
    val sorted = buf.sortedCopy
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

  override def serialize(buf: DoubleBuffer): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(buf.size * 8 + 4)
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeDouble(buf(i)); i += 1 }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): DoubleBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new DoubleBuffer(new Array[Double](math.max(n, 1)), 0)
    var i = 0
    while (i < n) { buf.add(in.readDouble()); i += 1 }
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
