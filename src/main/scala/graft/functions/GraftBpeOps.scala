package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled BPE-encode kernel (see [[graft.llm.Bpe]] for the trainer and
  * the semantics contract).
  *
  * `merges` arrives as an `array<string>` literal of space-joined pairs
  * ("l r" — symbols never contain whitespace because words are
  * whitespace-split). Parsing the merge table per row would cost O(m)
  * per document, so the parsed form is memoized per thread keyed on the
  * literal's object identity — the literal is a single shared instance
  * per plan, making the memo a hit for every row after the first.
  * Encoding itself applies each merge in rank order as one
  * left-to-right non-overlapping pass (the fold the DuckDB oracle
  * mirrors), with a bounded per-thread word→tokens memo: corpus word
  * frequencies are Zipfian, so virtually every encode after warmup is a
  * map hit even at 32k merges.
  */
object GraftBpeOps {

  private val parsedMemo =
    new ThreadLocal[(AnyRef, Array[(String, String)])]()
  private val wordMemo =
    ThreadLocal.withInitial[java.util.HashMap[(AnyRef, String), Array[String]]](
      () => new java.util.HashMap())
  private val WordMemoCap = 65536

  private def parsed(merges: ArrayData): Array[(String, String)] = {
    val m = parsedMemo.get()
    if (m != null && (m._1 eq merges)) m._2
    else {
      val n = merges.numElements()
      val p = new Array[(String, String)](n)
      var i = 0
      while (i < n) {
        val s = merges.getUTF8String(i).toString
        val sp = s.indexOf(' ')
        require(sp > 0, s"malformed merge entry '$s' (expected 'left right')")
        p(i) = (s.substring(0, sp), s.substring(sp + 1))
        i += 1
      }
      parsedMemo.set((merges, p))
      p
    }
  }

  /** Initial symbolization of a word: one symbol per Unicode CODE POINT.
    * The DuckDB oracle's `substr(word, i, 1)` unit is the code point, so
    * splitting by UTF-16 code unit (`charAt`) would diverge on
    * supplementary-plane text (emoji, rare CJK): a surrogate pair would
    * become two lone-surrogate "symbols" whose merges and token counts
    * the oracle never sees. Shared by the trainer ([[graft.llm.Bpe]])
    * and the encode kernel so both sides segment identically. */
  def codePointSymbols(word: String): Array[String] = {
    val n = word.codePointCount(0, word.length)
    val syms = new Array[String](n)
    var i = 0
    var k = 0
    while (i < word.length) {
      val step = Character.charCount(word.codePointAt(i))
      syms(k) = word.substring(i, i + step)
      i += step
      k += 1
    }
    syms
  }

  /** One left-to-right non-overlapping application of merge (l, r). */
  def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    if (syms.length < 2) return syms
    val out = new java.util.ArrayList[String](syms.length)
    var i = 0
    while (i < syms.length) {
      val s = syms(i)
      val last = out.size() - 1
      if (last >= 0 && out.get(last) == l && s == r) out.set(last, l + r)
      else out.add(s)
      i += 1
    }
    out.toArray(new Array[String](out.size()))
  }

  private def encodeWord(
      word: String,
      ms: Array[(String, String)],
      memoKey: AnyRef): Array[String] = {
    val memo = wordMemo.get()
    val key = (memoKey, word)
    val hit = memo.get(key)
    if (hit != null) return hit
    var syms = codePointSymbols(word)
    var j = 0
    while (j < ms.length) { syms = applyMerge(syms, ms(j)._1, ms(j)._2); j += 1 }
    if (memo.size() >= WordMemoCap) memo.clear()
    memo.put(key, syms)
    syms
  }

  /** BPE-encode `text`: whitespace-split words (Spark `split(trim(s),
    * "\\s+")` semantics), each encoded by applying the merges in rank
    * order; token arrays concatenate in word order. */
  def encode(text: UTF8String, merges: ArrayData): ArrayData = {
    val ms = parsed(merges)
    // UTF8String.trim = Spark's `trim` (spaces only) — NOT Java
    // String.trim, which also strips control characters
    val words = text.trim().toString.split("\\s+", -1)
    val out = new java.util.ArrayList[Any]()
    var w = 0
    while (w < words.length) {
      val toks = encodeWord(words(w), ms, merges)
      var t = 0
      while (t < toks.length) { out.add(UTF8String.fromString(toks(t))); t += 1 }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column wrapper: compiled [[encode]] with the merge table baked in as
    * a shared array literal. */
  def bpeEncode(s: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(StaticInvoke(
      GraftBpeOps.getClass,
      ArrayType(StringType, containsNull = false),
      "encode",
      Seq(ColumnBridge.expression(s),
        Literal.create(merges.map(m => m._1 + " " + m._2),
          ArrayType(StringType, containsNull = false))),
      propagateNull = true,
      returnNullable = false))
}
