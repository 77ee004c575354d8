package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded best-k buffer ordered (score desc, id asc). */
final class TopKState(
    val rows: java.util.TreeSet[(Double, Long)] =
      new java.util.TreeSet[(Double, Long)](
        ((a: (Double, Long), b: (Double, Long)) => {
          val c = java.lang.Double.compare(b._1, a._1) // score desc
          if (c != 0) c else java.lang.Long.compare(a._2, b._2) // id asc
        }): java.util.Comparator[(Double, Long)]))

/** Mergeable per-group top-k — the exchange-shape fix for "best k rows
  * per group" at fact scale. The window spelling
  * (`row_number() OVER (PARTITION BY g ORDER BY score DESC)`) moves
  * EVERY scored row through the exchange into per-group partitions
  * before discarding all but k; this aggregate keeps a bounded
  * (score desc, id asc) buffer per group per partition, so only
  * `k` rows per (partition, group) cross the wire — at a 10⁹-row scored
  * scan that is the difference between shuffling the scan and shuffling
  * kilobytes. Merge folds buffers; the (score, id) order is total, so
  * the result is independent of partitioning and merge order and equals
  * the window form row-for-row (spec-pinned).
  *
  * Output: array of (id, score) structs, best first — `posexplode` turns
  * it back into ranked rows. NULL scores/ids are ignored (SQL agg
  * semantics). Identical (score, id) pairs deduplicate in the buffer:
  * callers supply ids unique within a group (every join-key use does). */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKState] {

  require(k >= 1, s"top_k_by_score needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by_score expects (double, bigint), got " +
        s"(${score.dataType.catalogString}, ${id.dataType.catalogString})")

  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKState = new TopKState()

  private def add(buf: TopKState, s: Double, i: Long): Unit = {
    buf.rows.add((s, i))
    if (buf.rows.size > k) buf.rows.remove(buf.rows.last())
  }

  override def update(buf: TopKState, input: InternalRow): TopKState = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      add(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKState, other: TopKState): TopKState = {
    val it = other.rows.iterator()
    while (it.hasNext) {
      val (s, i) = it.next()
      add(buf, s, i)
    }
    buf
  }

  override def eval(buf: TopKState): Any = {
    val out = new Array[Any](buf.rows.size)
    val it = buf.rows.iterator()
    var j = 0
    while (it.hasNext) {
      val (s, i) = it.next()
      out(j) = new GenericInternalRow(Array[Any](i, s))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.rows.size)
    val it = buf.rows.iterator()
    while (it.hasNext) {
      val (s, i) = it.next()
      out.writeDouble(s)
      out.writeLong(i)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new TopKState()
    val n = in.readInt()
    var j = 0
    while (j < n) { st.rows.add((in.readDouble(), in.readLong())); j += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
}

object TopKByScore {
  /** Column-API wrapper. */
  def apply(score: Column, id: Column, k: Int)(implicit d: DummyImplicit): Column =
    ColumnBridge.column(new TopKByScore(
      ColumnBridge.expression(score), ColumnBridge.expression(id), k)
      .toAggregateExpression())
}
