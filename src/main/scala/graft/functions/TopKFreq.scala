package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Mutable frequent-items state: item → lower-bound counter, plus the
  * total decrement mass `delta` (uniform overcount bound). */
final class FreqSketchState(
    val counts: java.util.HashMap[String, Array[Long]] = new java.util.HashMap(),
    var delta: Long = 0L)

/** Heavy hitters in ONE streaming pass: the Misra–Gries frequent-items
  * sketch (Misra & Gries 1982 — the deterministic core of SpaceSaving,
  * Metwally et al. 2005) as a mergeable `TypedImperativeAggregate` — the
  * 100 TB answer to "top-k most frequent items" that never shuffles
  * anything but fixed-size sketches. Each partition folds its rows into a
  * ≤`capacity`-counter summary; partials merge by counter addition
  * followed by the subtract-the-(capacity+1)-th-largest rule — the merge
  * Agarwal et al. 2012 ("Mergeable Summaries") PROVE keeps the error
  * bounds additive in any merge order/tree. (Naively summing matching
  * counters and truncating — the obvious merge — silently breaks the
  * `true ≤ est` side once an item was evicted in one partial but counted
  * in another; the seeded fuzz in TopKFreqSpec catches exactly that.)
  * The exchange carries O(capacity) bytes per partition instead of one
  * row per distinct item — a `groupBy(item).count.orderBy.limit(k)` is
  * exact but materializes EVERY distinct item through its first shuffle;
  * at web-corpus cardinalities (10⁹⁺ distinct tokens/URLs) the sketch is
  * the only single-pass shape that holds.
  *
  * Guarantees, any partitioning and merge order (`c` = internal counter,
  * `delta` = total decrement mass, reported `est = c + delta`,
  * `err = delta`):
  *  - `est − err ≤ true ≤ est` for every reported item;
  *  - `delta ≤ n / (capacity + 1)`, so every item with
  *    `true > n / (capacity + 1)` is in the sketch (an absent item has
  *    `true ≤ delta`);
  *  - when every per-buffer distinct count stays ≤ `capacity`, no
  *    decrement ever fires and the sketch is EXACT (`err = 0`,
  *    `est = true`) regardless of partitioning or merge order — which is
  *    what makes the registry query hash-checkable against an exact SQL
  *    oracle while the sketch path is property-tested separately.
  *
  * Output: `array<struct<item, est, err>>`, the top `k` by (est desc,
  * item asc). NULL items are ignored (SQL count semantics).
  */
case class TopKFreq(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqSketchState] {

  require(k > 0 && capacity >= k, s"need 0 < k <= capacity, got k=$k capacity=$capacity")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_freq expects a string item column, got ${child.dataType.catalogString}")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_freq"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): FreqSketchState = new FreqSketchState()

  override def update(buf: FreqSketchState, input: InternalRow): FreqSketchState = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String].toString
    val cur = buf.counts.get(item)
    if (cur != null) cur(0) += 1
    else if (buf.counts.size < capacity) buf.counts.put(item, Array(1L))
    else {
      // Misra-Gries decrement epoch: every counter and the arriving item
      // each give up one occurrence (capacity+1 total mass per epoch)
      val it = buf.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        e.getValue()(0) -= 1
        if (e.getValue()(0) == 0L) it.remove()
      }
      buf.delta += 1
    }
    buf
  }

  override def merge(buf: FreqSketchState, other: FreqSketchState): FreqSketchState = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.counts.get(e.getKey)
      if (cur != null) cur(0) += e.getValue()(0)
      else buf.counts.put(e.getKey, e.getValue().clone())
    }
    buf.delta += other.delta
    if (buf.counts.size > capacity) {
      // subtract the (capacity+1)-th largest counter from everything and
      // drop the non-positive rest (Agarwal et al. 2012's proven merge)
      val cs = new Array[Long](buf.counts.size)
      var i = 0
      val vs = buf.counts.values().iterator()
      while (vs.hasNext) { cs(i) = vs.next()(0); i += 1 }
      java.util.Arrays.sort(cs)
      val t = cs(cs.length - (capacity + 1)) // (capacity+1)-th largest
      val es = buf.counts.entrySet().iterator()
      while (es.hasNext) {
        val e = es.next()
        e.getValue()(0) -= t
        if (e.getValue()(0) <= 0L) es.remove()
      }
      buf.delta += t
    }
    buf
  }

  private def sortedEntries(buf: FreqSketchState): Array[(String, Long)] = {
    val arr = new Array[(String, Long)](buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue()(0)); i += 1 }
    scala.util.Sorting.stableSort(arr,
      (a: (String, Long), b: (String, Long)) =>
        a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    arr
  }

  override def eval(buf: FreqSketchState): Any = {
    val entries = sortedEntries(buf).take(k)
    val rows = new Array[Any](entries.length)
    var i = 0
    while (i < entries.length) {
      val (item, c) = entries(i)
      rows(i) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(item), c + buf.delta, buf.delta))
      i += 1
    }
    new GenericArrayData(rows)
  }

  // length-prefixed UTF-8 (writeUTF would cap items at 64 KB)
  override def serialize(buf: FreqSketchState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.delta)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
      out.writeLong(e.getValue()(0))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqSketchState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new FreqSketchState()
    st.delta = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      st.counts.put(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        Array(in.readLong()))
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKFreq =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKFreq =
    copy(inputAggBufferOffset = offset)
}

object TopKFreq {
  /** Column-API wrapper. */
  def apply(item: Column, k: Int, capacity: Int)(implicit d: DummyImplicit): Column =
    ColumnBridge.column(
      new TopKFreq(ColumnBridge.expression(item), k, capacity).toAggregateExpression())
}
