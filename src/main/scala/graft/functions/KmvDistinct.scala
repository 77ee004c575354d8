package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Bounded bottom-k distinct-hash state. */
final class KmvState(
    val mins: java.util.TreeSet[java.lang.Long] = new java.util.TreeSet())

/** Distinct-count estimation in ONE streaming pass: the K-Minimum-Values
  * sketch (Bar-Yossef et al. 2002; Beyer et al. 2007's unbiased
  * estimator) as a mergeable `TypedImperativeAggregate` — the 100 TB
  * answer to "how many distinct tokens/URLs/ngrams" that never shuffles
  * more than k longs per group. An exact `COUNT(DISTINCT x)` materializes
  * every distinct value through the exchange; at web-corpus cardinalities
  * the sketch is the single-pass shape that holds.
  *
  * Why KMV and not HLL here: the bottom-k set of a value set is a pure
  * FUNCTION of the set — independent of partitioning, merge order, or
  * arrival order — so both the exact path (fewer than k distinct hashes
  * seen: the answer IS the count) and the ESTIMATE path
  * (`(k−1)·M / kth_min`, integer division) are bit-deterministic and
  * SQL-expressible, which lets the driver gate hash-check even the
  * approximate answers against a DuckDB mirror (bottom-k via
  * row_number). HLL's stochastic averaging admits no such mirror.
  *
  * Hashing: the portable [[graft.llm.TextHash.polyHash]] family
  * (30-bit prime modulus `M` = 1000000007), the same hash every oracle
  * mirrors. "Distinct" therefore means distinct HASHES: colliding
  * strings merge (expected n²/2M collisions — ~0.5 at 10⁵ distinct);
  * the mirror collides identically, so the gate stays exact. Production
  * deployments that need collision headroom at 10⁹⁺ cardinalities widen
  * the hash and keep the identical sketch algebra.
  *
  * Output: struct `(n_distinct, is_exact)` — `is_exact` true iff the
  * sketch held every distinct hash (fewer than k seen), in which case
  * `n_distinct` equals the true distinct-hash count. Standard error of
  * the estimate path ≈ 1/√(k−2). NULLs are ignored (SQL semantics).
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvState] {

  require(k >= 4, s"kmv_distinct needs k >= 4, got $k")

  private val M = graft.llm.TextHash.Prime

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct expects a string column, got ${child.dataType.catalogString}")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"
  override def dataType: DataType = StructType(Seq(
    StructField("n_distinct", LongType, nullable = false),
    StructField("is_exact", BooleanType, nullable = false)))

  override def createAggregationBuffer(): KmvState = new KmvState()

  private def add(buf: KmvState, h: Long): Unit = {
    if (buf.mins.size < k) { buf.mins.add(h); () }
    else if (h < buf.mins.last()) {
      if (buf.mins.add(h)) buf.mins.remove(buf.mins.last())
    }
  }

  /** polyHash concentrates short strings into narrow bands (a 4-char
    * token never exceeds ~7·31⁴), which wrecks the order-statistics
    * estimator (it assumes uniform draws on [0, M)). Two multiply-mod
    * rounds — each a BIJECTION on [0, M), so distinctness is exactly
    * preserved — scatter the bands to near-uniform (measured: raw est
    * 6× low; 2 rounds within 2%). The oracle mirrors the same two
    * rounds in SQL. */
  private def scatter(h: Long): Long =
    ((h * 1000003L + 17L) % M * 1000003L + 17L) % M

  override def update(buf: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null)
      add(buf, scatter(GraftHashOps.polyHash(v.asInstanceOf[UTF8String])))
    buf
  }

  override def merge(buf: KmvState, other: KmvState): KmvState = {
    val it = other.mins.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: KmvState): Any = {
    val n = buf.mins.size
    if (n < k) new GenericInternalRow(Array[Any](n.toLong, true))
    else {
      val kth = buf.mins.last().longValue()
      require(kth > 0, "kmv_distinct: degenerate kth-minimum hash 0")
      // Beyer et al.'s (k-1)/U_(k) with U scaled to the hash modulus M;
      // integer division keeps the estimate bit-deterministic and
      // SQL-mirrorable
      new GenericInternalRow(Array[Any]((k - 1).toLong * M / kth, false))
    }
  }

  override def serialize(buf: KmvState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.mins.size)
    val it = buf.mins.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new KmvState()
    val n = in.readInt()
    var i = 0
    while (i < n) { st.mins.add(in.readLong()); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvDistinct =
    copy(inputAggBufferOffset = offset)
}

object KmvDistinct {
  /** Column-API wrapper. */
  def apply(item: Column, k: Int)(implicit d: DummyImplicit): Column =
    ColumnBridge.column(
      new KmvDistinct(ColumnBridge.expression(item), k).toAggregateExpression())
}

/** The KMV sketch's STATE as a value: the sorted bottom-k distinct
  * hashes themselves (ascending), rather than the finished
  * `(n_distinct, is_exact)` verdict. This is what makes the
  * [[graft.llm.Profile]] report INCREMENTAL: a per-drop profile persists
  * these arrays, and because the bottom-k of a union is the bottom-k of
  * the united bottom-k sets (the defining KMV merge identity), merging
  * per-drop states reproduces the single-pass sketch over the union TO
  * THE BIT — no re-scan of any prior drop. Same hashing/scatter
  * discipline as [[KmvDistinct]], so the merged result stays mirrorable
  * by the DuckDB gate. */
case class KmvHashes(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvState] {

  require(k >= 4, s"kmv_hashes needs k >= 4, got $k")

  private val M = graft.llm.TextHash.Prime

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "kmv_hashes expects a string column (hashed internally) or a " +
        "long column (a precomputed polyHash, or any id — folded into " +
        s"[0, M) first), got ${child.dataType.catalogString}")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvState = new KmvState()

  private def add(buf: KmvState, h: Long): Unit = {
    if (buf.mins.size < k) { buf.mins.add(h); () }
    else if (h < buf.mins.last()) {
      if (buf.mins.add(h)) buf.mins.remove(buf.mins.last())
    }
  }

  private def scatter(h: Long): Long =
    ((h * 1000003L + 17L) % M * 1000003L + 17L) % M

  // lazy: dataType is unresolvable at construction (Catalyst resolves
  // children later); first touch happens at execution time
  private lazy val childIsLong = child.dataType == LongType

  override def update(buf: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) {
      // A long input is a precomputed polyHash (e.g. the compiled
      // ngramHashes kernel's output) — same scatter, identical sketch.
      // Arbitrary longs (raw ids) are first folded into [0, M): without
      // this, scatter's h*1000003 multiply overflows Long and the
      // "hashes" go negative, silently corrupting the k-th minimum. The
      // fold is the identity for in-range polyHash values (every
      // existing oracle), and for out-of-range inputs it is the same
      // deterministic ((h % M) + M) % M a SQL mirror computes.
      val h =
        if (childIsLong) {
          val raw = v.asInstanceOf[Long]
          ((raw % M) + M) % M
        } else GraftHashOps.polyHash(v.asInstanceOf[UTF8String])
      add(buf, scatter(h))
    }
    buf
  }

  override def merge(buf: KmvState, other: KmvState): KmvState = {
    val it = other.mins.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: KmvState): Any = {
    val out = new Array[Any](buf.mins.size)
    val it = buf.mins.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buf: KmvState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.mins.size)
    val it = buf.mins.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new KmvState()
    val n = in.readInt()
    var i = 0
    while (i < n) { st.mins.add(in.readLong()); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvHashes =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvHashes =
    copy(inputAggBufferOffset = offset)
}

object KmvHashes {
  /** Column-API wrapper. */
  def apply(item: Column, k: Int)(implicit d: DummyImplicit): Column =
    ColumnBridge.column(
      new KmvHashes(ColumnBridge.expression(item), k).toAggregateExpression())
}
