package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** 128-bit accumulator state for the PCA moment sums: value of cell c is
  * `hi(c)·2⁶⁴ + lo(c)` (two's complement, lo unsigned). */
final class PcaMomentState(m: Int) {
  var n: Long = 0L
  val hi: Array[Long] = new Array[Long](m)
  val lo: Array[Long] = new Array[Long](m)

  /** 128-bit += of a signed 64-bit addend (branchless carry). */
  def add(c: Int, x: Long): Unit = {
    val l = lo(c)
    val r = l + x
    lo(c) = r
    // unsigned carry out of the low word, minus the sign extension of x
    hi(c) += (x >> 63) + (((l & x) | ((l | x) & ~r)) >>> 63)
  }
}

/** One-pass PCA moment sums as a mergeable aggregate — the shuffle-free
  * replacement for [[GraftVecOps.pcaMoments]]'s explode + groupBy(i, j):
  * the explode multiplied every vector row by d(d+3)/2 + 1 struct rows
  * (2 145× at d = 64 — 8.6 M rows per model build at sf0.1) only so a
  * hash aggregate could re-collapse them; here each task folds its
  * vectors straight into one fixed d(d+3)/2-cell accumulator and ships
  * THAT (guide §2.3 — aggregate before you shuffle, here: never
  * materialize the per-row contributions at all).
  *
  * Exactness contract (unchanged from the decimal-sum spelling): per-cell
  * sums are EXACT 128-bit integers — micros products are ≤ 1e14, so a
  * 64-bit cell would overflow at ~9.2e4 rows per partition, while 128 bits
  * hold ≥ 1.7e24 rows — far beyond any corpus; the count n would overflow
  * with it long after. Addition is associative and commutative, so the
  * result is independent of partitioning and merge order, exactly like
  * the decimal(38,0) SUM it replaces, and the emitted decimals are
  * bit-identical (PcaSpec pins model equality).
  *
  * Output: array of the same `(i, j, s)` rows the old aggregation
  * produced — d first moments (i, −1), the d(d+1)/2 upper-triangle
  * second moments (i ≤ j), and the (−2, −2, n) count row; EMPTY array
  * for zero input rows (the "empty drop ⇒ empty state" contract —
  * exploding the result preserves it). A vector whose length differs
  * from `dim` is an ERROR, as in the kernel.
  */
case class PcaMomentSums(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PcaMomentState] {

  require(dim >= 1, s"pca_moment_sums needs dim >= 1, got $dim")

  private val m = dim + dim * (dim + 1) / 2

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pca_moment_sums expects array<bigint> (micros-quantized vector), got ${other.catalogString}")
    }

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def nullable: Boolean = false
  override def prettyName: String = "pca_moment_sums"

  private val rowType = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("s", DecimalType(38, 0), nullable = false)))
  override def dataType: DataType = ArrayType(rowType, containsNull = false)

  override def createAggregationBuffer(): PcaMomentState = new PcaMomentState(m)

  override def update(buf: PcaMomentState, input: InternalRow): PcaMomentState = {
    val v = child.eval(input)
    if (v != null) {
      val q = v.asInstanceOf[ArrayData]
      require(q.numElements() == dim,
        s"pca_moment_sums: expected $dim-dim vector, got ${q.numElements()}")
      val qs = new Array[Long](dim)
      var i = 0
      while (i < dim) { qs(i) = q.getLong(i); i += 1 }
      var c = 0
      i = 0
      while (i < dim) {
        buf.add(c, qs(i)) // first moment (i, -1)
        c += 1
        var j = i
        while (j < dim) { buf.add(c, qs(i) * qs(j)); c += 1; j += 1 }
        i += 1
      }
      buf.n += 1
    }
    buf
  }

  override def merge(buf: PcaMomentState, other: PcaMomentState): PcaMomentState = {
    var c = 0
    while (c < m) {
      // 128-bit += 128-bit: low add with unsigned carry, highs add through
      val l = buf.lo(c); val x = other.lo(c)
      val r = l + x
      buf.lo(c) = r
      buf.hi(c) += other.hi(c) + (((l & x) | ((l | x) & ~r)) >>> 63)
      c += 1
    }
    buf.n += other.n
    buf
  }

  private def toDecimal(hi: Long, lo: Long): Decimal = {
    val bytes = new Array[Byte](16)
    var k = 0
    while (k < 8) {
      bytes(k) = (hi >>> (56 - 8 * k)).toByte
      bytes(k + 8) = (lo >>> (56 - 8 * k)).toByte
      k += 1
    }
    Decimal(new java.math.BigDecimal(new java.math.BigInteger(bytes)), 38, 0)
  }

  override def eval(buf: PcaMomentState): Any = {
    if (buf.n == 0L) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m + 1)
    var c = 0
    var i = 0
    while (i < dim) {
      out(c) = new GenericInternalRow(Array[Any](i, -1, toDecimal(buf.hi(c), buf.lo(c))))
      c += 1
      var j = i
      while (j < dim) {
        out(c) = new GenericInternalRow(Array[Any](i, j, toDecimal(buf.hi(c), buf.lo(c))))
        c += 1
        j += 1
      }
      i += 1
    }
    out(m) = new GenericInternalRow(Array[Any](-2, -2,
      Decimal(java.math.BigDecimal.valueOf(buf.n), 38, 0)))
    new GenericArrayData(out)
  }

  override def serialize(buf: PcaMomentState): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 * (2 * m + 1))
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    var c = 0
    while (c < m) { out.writeLong(buf.hi(c)); out.writeLong(buf.lo(c)); c += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PcaMomentState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new PcaMomentState(m)
    st.n = in.readLong()
    var c = 0
    while (c < m) { st.hi(c) = in.readLong(); st.lo(c) = in.readLong(); c += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(offset: Int): PcaMomentSums =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): PcaMomentSums =
    copy(inputAggBufferOffset = offset)
}

object PcaMomentSums {
  /** Column-API wrapper: aggregate a micros-quantized `array<long>`
    * vector column into the `(i, j, s)` moment rows (as one array). */
  def apply(q: Column, dim: Int)(implicit d: DummyImplicit): Column =
    ColumnBridge.column(
      new PcaMomentSums(ColumnBridge.expression(q), dim).toAggregateExpression())
}
