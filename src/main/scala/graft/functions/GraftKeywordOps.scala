package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled multi-keyword matching — the taxonomy/domain-tagging scan a
  * mixture pipeline runs to route documents ("code"/"math"/"legal"/…)
  * before sampling.
  *
  * Why a kernel: counting V keywords with per-keyword SQL (`replace` or
  * `instr` loops) scans the text V times; the Aho–Corasick automaton
  * (Aho & Corasick 1975) scans it ONCE for any keyword count, O(chars +
  * matches). The automaton compiles per thread from the keyword-array
  * literal (memoized on the literal's object identity, the
  * [[GraftModelOps]] discipline), so the operator stays a zero-shuffle
  * projection with a dimension-sized broadcast model.
  *
  * Semantics contract (what the DuckDB mirror reproduces):
  *  - occurrences are counted at EVERY start position, overlapping
  *    included ("aaa" contains "aa" twice) — the
  *    `generate_series`/`substr` formulation, not `replace`'s
  *    non-overlapping walk;
  *  - positions are Unicode CODE POINTS (DuckDB `substr` character
  *    semantics), not UTF-16 code units — supplementary-plane text
  *    counts identically in both engines;
  *  - NULL text counts as the empty string (all-zero counts), keeping
  *    gate routing well-defined (the [[GraftModelOps]] NULL discipline).
  */
object GraftKeywordOps {

  /** Aho–Corasick automaton over code points. `kwAt(n)` = keyword index
    * ending at node n (-1 if none; keywords are required distinct),
    * `dict(n)` = nearest proper-suffix output node (0 = none — node 0 is
    * the root, never an output). */
  final class Automaton(val keywords: Array[String]) {
    require(keywords.nonEmpty, "keywordCounts: empty keyword list")
    require(keywords.forall(_.nonEmpty), "keywordCounts: empty keyword")
    require(keywords.distinct.length == keywords.length,
      "keywordCounts: duplicate keywords")

    private val goto_ = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Integer, Integer]())
    private val kwBuf = scala.collection.mutable.ArrayBuffer(-1)

    for ((kw, ki) <- keywords.zipWithIndex) {
      var s = 0
      var i = 0
      while (i < kw.length) {
        val cp = kw.codePointAt(i)
        val nxt = goto_(s).get(cp)
        if (nxt != null) s = nxt.intValue()
        else {
          goto_ += new java.util.HashMap[Integer, Integer]()
          kwBuf += -1
          goto_(s).put(cp, goto_.length - 1)
          s = goto_.length - 1
        }
        i += Character.charCount(cp)
      }
      kwBuf(s) = ki
    }

    val kwAt: Array[Int] = kwBuf.toArray
    val fail: Array[Int] = new Array[Int](goto_.length)
    val dict: Array[Int] = new Array[Int](goto_.length)

    {
      val queue = new java.util.ArrayDeque[Integer]()
      goto_(0).forEach((_, v) => queue.add(v))
      while (!queue.isEmpty) {
        val u = queue.poll().intValue()
        dict(u) = if (kwAt(fail(u)) >= 0) fail(u) else dict(fail(u))
        goto_(u).forEach { (cp, v) =>
          var f = fail(u)
          while (f != 0 && goto_(f).get(cp) == null) f = fail(f)
          val t = goto_(f).get(cp)
          fail(v) = if (t != null && t.intValue() != v.intValue()) t.intValue() else 0
          queue.add(v)
        }
      }
    }

    def step(state: Int, cp: Int): Int = {
      var s = state
      var nxt = goto_(s).get(cp)
      while (nxt == null && s != 0) { s = fail(s); nxt = goto_(s).get(cp) }
      if (nxt == null) 0 else nxt.intValue()
    }
  }

  private val MemoCap = 64
  private val memo = ThreadLocal.withInitial[
    java.util.IdentityHashMap[AnyRef, Automaton]](
    () => new java.util.IdentityHashMap())

  private def automaton(kws: ArrayData): Automaton = {
    val m = memo.get()
    val hit = m.get(kws)
    if (hit != null) return hit
    val arr = new Array[String](kws.numElements())
    var i = 0
    while (i < arr.length) { arr(i) = kws.getUTF8String(i).toString; i += 1 }
    val a = new Automaton(arr)
    if (m.size() >= MemoCap) m.clear()
    m.put(kws, a)
    a
  }

  /** All-occurrence count of every keyword in `text` (keyword order),
    * one automaton pass. */
  def keywordCounts(text: UTF8String, kws: ArrayData): ArrayData = {
    val a = automaton(kws)
    val counts = new Array[Long](a.keywords.length)
    if (text != null) {
      val s = text.toString
      var state = 0
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        state = a.step(state, cp)
        var o = if (a.kwAt(state) >= 0) state else a.dict(state)
        while (o != 0) {
          counts(a.kwAt(o)) += 1
          o = a.dict(o)
        }
        i += Character.charCount(cp)
      }
    }
    new GenericArrayData(counts.map(x => x: Any))
  }

  // ------------------------------------------------------------ wrappers

  private val longArray = ArrayType(LongType, containsNull = false)
  private val stringArray = ArrayType(StringType, containsNull = false)

  /** Compiled per-keyword occurrence counts over a literal keyword set. */
  def keywordCountsKernel(text: Column, keywords: Seq[String]): Column =
    ColumnBridge.column(StaticInvoke(
      GraftKeywordOps.getClass, longArray, "keywordCounts",
      Seq(ColumnBridge.expression(text),
        Literal.create(keywords, stringArray): Expression),
      propagateNull = false, returnNullable = false))
}
