package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count–Min sketch (Cormode & Muthukrishnan 2005) as a mergeable
  * `TypedImperativeAggregate` — the point-frequency complement of the
  * Misra–Gries heavy hitters ([[TopKFreq]]): MG answers "which items are
  * frequent", CM answers "roughly how often does THIS item occur" for
  * ANY queried item, without ever shuffling one row per distinct item.
  * The 100 TB use: estimate contamination n-gram / URL / token counts in
  * one pass with a fixed `depth × width` grid of longs per partition
  * through the exchange.
  *
  * Layout: row-major `depth × width` counter grid, emitted as one
  * `array<long>`. Row `r` buckets an item at
  * `((polyHash(item) · (1000003 + 7919·r) + 17 + r) mod P) mod width` —
  * the same portable integer family as every other graft hash (P =
  * 1e9+7; products stay < 2^60, so plain BIGINT arithmetic reproduces it
  * in any engine, which is what lets the registry hash-check the WHOLE
  * GRID against a DuckDB mirror, not just sampled estimates).
  *
  * Estimates ([[CountMin.estimateCol]]): `est(x) = min_r grid[r·width +
  * bucket_r(x)]`. Guarantees, any partitioning/merge order (merge is
  * elementwise addition — exactly associative/commutative):
  * `true ≤ est` always, and `est ≤ true + 2n/width` with probability
  * ≥ 1 − 2^−depth over the hash family. Deterministic here: same input
  * set → same grid, bit for bit. NULL items are ignored.
  */
case class CountMin(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"need 1 <= depth <= 16, got $depth")
  require(width >= 2, s"need width >= 2, got $width")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_min expects a string item column, got ${child.dataType.catalogString}")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val h = GraftHashOps.polyHash(v.asInstanceOf[UTF8String])
    var r = 0
    while (r < depth) {
      buf(r * width + CountMin.bucket(h, r, width)) += 1L
      r += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(java.lang.Long.valueOf(_): Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMin =
    copy(inputAggBufferOffset = newOffset)
}

object CountMin {

  val P: Long = graft.llm.TextHash.Prime

  /** Row-`r` bucket of a polyHash value — kept in plain 63-bit longs
    * (h < 1e9+7, multiplier < 2^21 ⇒ product < 2^52) so any BIGINT
    * engine reproduces it. */
  def bucket(h: Long, r: Int, width: Int): Int =
    (((h * (1000003L + 7919L * r) + 17L + r) % P) % width).toInt

  /** Aggregate Column: `CountMin(item, depth, width)` over string items. */
  def apply(item: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CountMin(ColumnBridge.expression(item), depth, width).toAggregateExpression())

  /** Point estimate of `item` against a sketch column: `min_r` of the
    * row-r counter — a pure projection over the grid array (1-based
    * `element_at`). */
  def estimateCol(sketch: Column, item: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    val h = HashFunctions.polyHash(item)
    val perRow = (0 until depth).map { r =>
      element_at(sketch,
        (lit(r * width) +
          (((h * lit(1000003L + 7919L * r) + lit(17L + r)) % P) % width) + 1).cast("int"))
    }
    if (perRow.length == 1) perRow.head else least(perRow: _*)
  }
}
