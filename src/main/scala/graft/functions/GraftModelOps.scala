package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled scoring kernels for the trained curation models
  * ([[graft.llm.Classify]] naive Bayes, [[graft.llm.LangModel]] bigram
  * LM).
  *
  * Why kernels: both scorers look tokens up in a model passed as a
  * literal, and Catalyst's `GetMapValue` on a literal map is a LINEAR
  * scan — O(|model|) string compares per lookup. Fine for a 64-entry
  * vocabulary; catastrophic for a bigram table (the C1 profile measured
  * 254 s for 500k docs at a ~27k-entry bigram map ≈ 5·10¹² compares).
  * Here the model literals parse ONCE per thread into real hash maps
  * (memoized on the literal's object identity — one shared instance per
  * plan), so every lookup is O(1) and the 500k-doc scoring pass drops to
  * seconds. Integer sums in the exact order of the HOF formulations —
  * bit-identical outputs, same oracles.
  */
object GraftModelOps {

  // Per-thread memos keyed on the literal key-array's object identity.
  // BOUNDED: tasks deserialize their own literal instances, so a
  // long-running stream (scoreGateSink scores every trigger through
  // these kernels) would otherwise add one parsed model per task per
  // thread forever — the memo clears past MemoCap entries (a handful of
  // live models at any moment; a clear merely re-parses on next use).
  private val MemoCap = 64
  private val longMapMemo = ThreadLocal.withInitial[
    java.util.IdentityHashMap[AnyRef, java.util.HashMap[String, java.lang.Long]]](
    () => new java.util.IdentityHashMap())
  private val indexMapMemo = ThreadLocal.withInitial[
    java.util.IdentityHashMap[AnyRef, java.util.HashMap[String, java.lang.Integer]]](
    () => new java.util.IdentityHashMap())

  private def longMap(keys: ArrayData, vals: ArrayData): java.util.HashMap[String, java.lang.Long] = {
    val memo = longMapMemo.get()
    val hit = memo.get(keys)
    if (hit != null) return hit
    val n = keys.numElements()
    require(vals.numElements() == n, s"model keys/vals length mismatch: $n vs ${vals.numElements()}")
    val m = new java.util.HashMap[String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) { m.put(keys.getUTF8String(i).toString, vals.getLong(i)); i += 1 }
    if (memo.size() >= MemoCap) memo.clear()
    memo.put(keys, m)
    m
  }

  private def indexMap(keys: ArrayData): java.util.HashMap[String, java.lang.Integer] = {
    val memo = indexMapMemo.get()
    val hit = memo.get(keys)
    if (hit != null) return hit
    val n = keys.numElements()
    val m = new java.util.HashMap[String, java.lang.Integer](n * 2)
    var i = 0
    while (i < n) { m.put(keys.getUTF8String(i).toString, i); i += 1 }
    if (memo.size() >= MemoCap) memo.clear()
    memo.put(keys, m)
    m
  }

  /** Spark `split(trim(s), "\\s+")` semantics — UTF8String.trim (spaces
    * only, exactly Spark's `trim`), NOT Java String.trim (which also
    * strips control chars). Shared contract with [[GraftBpeOps.encode]]
    * and [[graft.llm.TextHash.wordTokens]]. */
  private def tokens(s: UTF8String): Array[String] =
    s.trim().toString.split("\\s+", -1)

  /** Bigram-LM document score (mirror of the
    * [[graft.llm.LangModel.lmScoreWith]] contract): over adjacent token
    * pairs with BOTH sides in the unigram table, sum the observed bigram
    * micro-log or the left token's fallback. Returns
    * (n_pairs, lp_micros). */
  def lmScore(
      text: UTF8String,
      uniKeys: ArrayData, uniVals: ArrayData,
      biKeys: ArrayData, biVals: ArrayData): InternalRow = {
    // NULL text scores as the empty token sequence -> (0, 0), matching
    // the DuckDB oracle (unnest of a NULL token list yields no rows) and
    // keeping the streaming gate's exactly-once routing well-defined
    // (a NULL score would make BOTH pass and !pass filters drop the doc).
    if (text == null) return new GenericInternalRow(Array[Any](0L, 0L))
    val uni = longMap(uniKeys, uniVals)
    val bi = longMap(biKeys, biVals)
    val ts = tokens(text)
    var n = 0L
    var lp = 0L
    var i = 0
    while (i < ts.length - 1) {
      val f1 = uni.get(ts(i))
      if (f1 != null && uni.containsKey(ts(i + 1))) {
        n += 1
        val b = bi.get(ts(i) + " " + ts(i + 1))
        lp += (if (b != null) b.longValue() else f1.longValue())
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, lp))
  }

  /** Naive-Bayes per-label scores (mirror of the
    * [[graft.llm.Classify.nbScoreWith]] fold): start from the priors,
    * add each in-vocab token's per-label micro-log likelihood row
    * (`likFlat` is token-major: token index × nLabels + label index).
    * Returns the score array in label order. */
  def nbScores(
      text: UTF8String,
      tokKeys: ArrayData, likFlat: ArrayData, priors: ArrayData): ArrayData = {
    val ix = indexMap(tokKeys)
    val nL = priors.numElements()
    require(nL > 0 && likFlat.numElements() == tokKeys.numElements() * nL,
      s"nbScores: likFlat length ${likFlat.numElements()} != ${tokKeys.numElements()} tokens x $nL labels")
    val scores = new Array[Long](nL)
    var l = 0
    while (l < nL) { scores(l) = priors.getLong(l); l += 1 }
    // NULL text scores as the empty token sequence -> priors only, so
    // the downstream argmax yields the prior-argmax label exactly as the
    // DuckDB oracle does for a NULL-text document.
    if (text == null) return new GenericArrayData(scores)
    val ts = tokens(text)
    var i = 0
    while (i < ts.length) {
      val t = ix.get(ts(i))
      if (t != null) {
        val off = t.intValue() * nL
        var j = 0
        while (j < nL) { scores(j) += likFlat.getLong(off + j); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(scores)
  }

  private val phraseSetMemo = ThreadLocal.withInitial[
    java.util.IdentityHashMap[AnyRef, java.util.HashSet[String]]](
    () => new java.util.IdentityHashMap())

  private def phraseSet(phrases: ArrayData): java.util.HashSet[String] = {
    val memo = phraseSetMemo.get()
    val hit = memo.get(phrases)
    if (hit != null) return hit
    val n = phrases.numElements()
    val s = new java.util.HashSet[String](n * 2)
    var i = 0
    while (i < n) { s.add(phrases.getUTF8String(i).toString); i += 1 }
    if (memo.size() >= MemoCap) memo.clear()
    memo.put(phrases, s)
    s
  }

  /** Greedy left-to-right single-pass phrase merge (exact mirror of
    * [[graft.llm.Collocations.mergePhrases]]' `aggregate` HOF fold, which
    * was CodegenFallback AND rebuilt the accumulator array per token —
    * O(tokens²) array copies per document, evaluated once per consuming
    * column): the next token merges into the LAST output token iff that
    * token contains no joiner (U+0001 — so merged tokens never re-merge,
    * and a source token carrying the joiner never merges) and
    * `last + J + next` is in the phrase set (per-thread memoized, like
    * the model maps above). Returns (n_tokens, n_after, text_merged)
    * with merged tokens joined by '_' and the document re-joined by ' ';
    * NULL text yields (0, 0, ''), matching the operator's NULL contract. */
  def phraseMerge(text: UTF8String, phrases: ArrayData): InternalRow = {
    if (text == null)
      return new GenericInternalRow(
        Array[Any](0L, 0L, UTF8String.fromString("")))
    val set = phraseSet(phrases)
    val ts = tokens(text)
    val out = new java.util.ArrayList[String](ts.length)
    var i = 0
    while (i < ts.length) {
      val x = ts(i)
      var merged = false
      if (!out.isEmpty) {
        val last = out.get(out.size() - 1)
        if (last.indexOf('\u0001') < 0 && set.contains(last + "\u0001" + x)) {
          out.set(out.size() - 1, last + "\u0001" + x)
          merged = true
        }
      }
      if (!merged) out.add(x)
      i += 1
    }
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j < out.size()) {
      if (j > 0) sb.append(' ')
      sb.append(out.get(j).replace('\u0001', '_'))
      j += 1
    }
    new GenericInternalRow(Array[Any](
      ts.length.toLong, out.size().toLong, UTF8String.fromString(sb.toString)))
  }

  // ------------------------------------------------------------ wrappers

  private val longArray = ArrayType(LongType, containsNull = false)
  private val stringArray = ArrayType(StringType, containsNull = false)

  /** Output schema of [[lmScore]]. */
  val LmScoreType: StructType = StructType(Seq(
    StructField("n_pairs", LongType, nullable = false),
    StructField("lp_micros", LongType, nullable = false)))

  // propagateNull=false: a NULL text argument reaches the method (which
  // maps it to the empty token sequence) instead of nulling the whole
  // score — the model-table literals are never null, so the only null
  // that can arrive is the text itself.
  private def invoke(name: String, dt: DataType, args: Seq[Expression]): Column =
    ColumnBridge.column(StaticInvoke(
      GraftModelOps.getClass, dt, name, args,
      propagateNull = false, returnNullable = false))

  /** Compiled LM scoring over literal model tables. */
  def lmScoreKernel(
      s: Column,
      uni: Seq[(String, Long)],
      bi: Seq[(String, Long)]): Column =
    invoke("lmScore", LmScoreType, Seq(
      ColumnBridge.expression(s),
      Literal.create(uni.map(_._1), stringArray),
      Literal.create(uni.map(_._2), longArray),
      Literal.create(bi.map(_._1), stringArray),
      Literal.create(bi.map(_._2), longArray)))

  /** Output schema of [[phraseMerge]]. */
  val PhraseMergeType: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_after", LongType, nullable = false),
    StructField("text_merged", StringType, nullable = false)))

  /** Compiled phrase merge over a literal `ab` phrase table. */
  def phraseMergeKernel(s: Column, phrases: Seq[String]): Column =
    invoke("phraseMerge", PhraseMergeType, Seq(
      ColumnBridge.expression(s),
      Literal.create(phrases, stringArray)))

  /** Compiled NB scoring over literal model tables: `lik` maps each
    * token (in `toks` order) to its label-ordered likelihood row. */
  def nbScoresKernel(
      s: Column,
      toks: Seq[String],
      likFlat: Seq[Long],
      priors: Seq[Long]): Column =
    invoke("nbScores", longArray, Seq(
      ColumnBridge.expression(s),
      Literal.create(toks, stringArray),
      Literal.create(likFlat, longArray),
      Literal.create(priors, longArray)))
}
