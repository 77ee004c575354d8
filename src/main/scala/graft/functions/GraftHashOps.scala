package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

import graft.llm.TextHash.{Prime, Seed}

/** Compiled kernels for the portable text hashes of
  * [[graft.llm.TextHash]].
  *
  * The higher-order-function formulations in TextHash are the *reference
  * semantics* — they are what the DuckDB oracle mirrors, and they are
  * correct — but Catalyst evaluates lambda bodies expression-node by
  * expression-node, so hashing ~400 shingles × 64 permutations per
  * document costs millions of interpreted node evaluations. These static
  * methods compute the identical values (pinned by
  * `HashFunctionsSpec` equivalence tests over the real corpus) in tight
  * JVM loops, and are exposed to Catalyst through `StaticInvoke`
  * ([[HashFunctions]]), which participates in whole-stage codegen as a
  * plain static call.
  *
  * Parity notes (all must hold or the oracle breaks):
  *  - iteration is by Unicode code point, matching Spark/DuckDB
  *    `substr`/`ascii` semantics (corpus is ASCII; this keeps the kernel
  *    honest beyond it);
  *  - distinct-by-hash equals the HOF's distinct-strings→hash→distinct
  *    composition (colliding strings collapse either way);
  *  - tokenization is `trim` (space-only, UTF8String.trim parity) then
  *    Java-regex `\s+` split — exactly what `split(trim(s), "\\s+")` does.
  *  - inputs are assumed non-empty strings (the corpus guarantees it; the
  *    HOF forms share the assumption).
  */
object GraftHashOps {

  private def codePoints(s: UTF8String): Array[Int] = {
    val str = s.toString
    val out = new Array[Int](str.codePointCount(0, str.length))
    var i = 0
    var o = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      out(o) = cp
      o += 1
      i += Character.charCount(cp)
    }
    out
  }

  private def foldRange(cp: Array[Int], from: Int, until: Int, acc0: Long): Long = {
    var acc = acc0
    var i = from
    while (i < until) {
      acc = (acc * 31 + cp(i)) % Prime
      i += 1
    }
    acc
  }

  /** polyHash of a whole string — identical to [[graft.llm.TextHash.polyHash]]. */
  def polyHash(s: UTF8String): Long = {
    val cp = codePoints(s)
    foldRange(cp, 0, cp.length, Seed)
  }

  /** Distinct char-k-gram hashes in first-occurrence order — identical
    * value set to `array_distinct(hashAll(charShingles(s, k)))`. */
  def shingleHashes(s: UTF8String, k: Int): ArrayData = {
    val cp = codePoints(s)
    val n = cp.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      seen.add(foldRange(cp, i, i + k, Seed))
      i += 1
    }
    toArrayData(seen)
  }

  private def tokens(s: UTF8String): Array[String] =
    s.trim().toString.split("\\s+")

  /** Token hashes with multiplicity — identical to
    * `hashAll(wordTokens(s))`. */
  def tokenHashes(s: UTF8String): ArrayData = {
    val ts = tokens(s)
    val out = new Array[Long](ts.length)
    var i = 0
    while (i < ts.length) {
      out(i) = hashString(ts(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Feature-hashing vectorizer (Spark MLlib's HashingTF re-derived on
    * the portable hash): a `dim`-bucket token-count vector,
    * `v[polyHash(token) % dim] += 1` — the classic trick that turns raw
    * text into a FIXED-width dense vector with no vocabulary pass at
    * all, so the whole vector stack (k-means, PCA, ANN, SemDeDup)
    * applies to text corpora directly. Counts as doubles (the vector
    * operators' input type). One pass over the tokens. */
  def hashedFeatures(s: UTF8String, dim: Int): ArrayData = {
    require(dim > 0, s"hashedFeatures needs dim > 0, got $dim")
    val ts = tokens(s)
    val out = new Array[Double](dim)
    var i = 0
    while (i < ts.length) {
      out((hashString(ts(i)) % dim).toInt) += 1.0
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct word-n-gram hashes — identical value set to
    * `array_distinct(hashAll(wordNgrams(wordTokens(s), n)))` (the gram
    * hash folds token chars with single separating spaces, which is
    * exactly the hash of the space-joined gram string). */
  def ngramHashes(s: UTF8String, n: Int): ArrayData = {
    val ts = tokens(s)
    val m = ts.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long](m * 2)
    var i = 0
    while (i < m) {
      var acc = Seed
      var t = 0
      while (t < n) {
        if (t > 0) acc = (acc * 31 + ' ') % Prime
        val w = ts(i + t)
        var c = 0
        while (c < w.length) {
          val cp = w.codePointAt(c)
          acc = (acc * 31 + cp) % Prime
          c += Character.charCount(cp)
        }
        t += 1
      }
      seen.add(acc)
      i += 1
    }
    toArrayData(seen)
  }

  /** POSITIONAL word n-gram hashes — duplicates kept, array index =
    * gram start position; identical to
    * `TextHash.posNgramHashes(wordTokens(s), n)` ([[ngramHashes]] is the
    * distinct-set variant). */
  def posNgramHashes(s: UTF8String, n: Int): ArrayData = {
    val ts = tokens(s)
    val m = ts.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = Seed
      var t = 0
      while (t < n) {
        if (t > 0) acc = (acc * 31 + ' ') % Prime
        val w = ts(i + t)
        var c = 0
        while (c < w.length) {
          val cp = w.codePointAt(c)
          acc = (acc * 31 + cp) % Prime
          c += Character.charCount(cp)
        }
        t += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature — identical to
    * [[graft.llm.TextHash.minhashSignature]]. */
  def minhashSig(hashes: ArrayData, perms: Int): ArrayData = {
    val hs = hashes.toLongArray()
    val sig = new Array[Long](perms)
    var j = 0
    while (j < perms) {
      val a = 2L * j + 1
      val b = j.toLong * j + 1
      var best = Long.MaxValue
      var i = 0
      while (i < hs.length) {
        val v = (hs(i) * a + b) % Prime
        if (v < best) best = v
        i += 1
      }
      sig(j) = best
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** SimHash fingerprint — identical to
    * `simhash(hashAll(wordTokens(s)), bits)`. */
  def simhash(s: UTF8String, bits: Int): Long = {
    val ts = tokens(s)
    val votes = new Array[Int](bits)
    var i = 0
    while (i < ts.length) {
      val h = hashString(ts(i))
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  private val BpeishPattern = java.util.regex.Pattern.compile("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")

  /** One-pass text statistics — value-identical to the expression
    * formulation in [[graft.llm.TextAnalysis.stats]] (codepoint counts,
    * Java-regex token/BPE-ish splits, int→double ratio divisions).
    * Returns a struct row matching `HashFunctions.TextStatsType`. */
  def textStats(s: UTF8String, stopwordsCsv: UTF8String): InternalRow = {
    val str = s.toString
    val nChars = str.codePointCount(0, str.length)
    val ts = tokens(s)
    val stop = stopwordsCsv.toString.split(",").toSet
    val distinct = new java.util.HashSet[String](ts.length * 2)
    var tokenChars = 0L
    var stopCount = 0
    var i = 0
    while (i < ts.length) {
      val w = ts(i)
      distinct.add(w)
      tokenChars += w.codePointCount(0, w.length)
      if (stop.contains(w)) stopCount += 1
      i += 1
    }
    var bpeish = 0
    val m = BpeishPattern.matcher(str)
    while (m.find()) bpeish += 1
    var alpha = 0
    var ci = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      if (cp >= 'a' && cp <= 'z') alpha += 1
      ci += Character.charCount(cp)
    }
    new GenericInternalRow(Array[Any](
      nChars,
      ts.length,
      distinct.size,
      bpeish,
      tokenChars,
      distinct.size.toDouble / ts.length,
      stopCount.toDouble / ts.length,
      alpha.toDouble / nChars))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken): the distinct
    * minima of every `w`-wide sliding window over the POSITIONAL k-gram
    * rolling hashes (not the distinct shingle set — winnowing is
    * position-sensitive), ascending. The value set is invariant to
    * in-window tie-breaking, so the set form is engine-portable; the
    * sliding minimum runs in O(n) via a monotonic deque. Documents
    * shorter than k+w-1 chars have no full window → empty. */
  def winnowHashes(s: UTF8String, k: Int, w: Int): ArrayData = {
    val cp = codePoints(s)
    val m = cp.length - k + 1
    if (m < w) return new GenericArrayData(Array.emptyLongArray)
    val g = new Array[Long](m)
    var i = 0
    while (i < m) {
      g(i) = foldRange(cp, i, i + k, Seed)
      i += 1
    }
    val seen = new java.util.TreeSet[java.lang.Long]()
    val deque = new java.util.ArrayDeque[Int]()
    var j = 0
    while (j < m) {
      while (!deque.isEmpty && g(deque.peekLast()) >= g(j)) deque.pollLast()
      deque.addLast(j)
      if (deque.peekFirst() <= j - w) deque.pollFirst()
      if (j >= w - 1) seen.add(g(deque.peekFirst()))
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) {
      out(o) = it.next()
      o += 1
    }
    new GenericArrayData(out)
  }

  /** Largest multiplicity in a long array (top-token count when fed
    * [[tokenHashes]]): sort a copy, scan the longest equal run. Per-row
    * O(n log n), no shuffle — the distributed alternative (explode +
    * two groupBys) ships every token through the wire. */
  def topRunCount(a: ArrayData): Int = {
    val n = a.numElements()
    if (n == 0) return 0
    val v = new Array[Long](n)
    var i = 0
    while (i < n) { v(i) = a.getLong(i); i += 1 }
    java.util.Arrays.sort(v)
    var best = 1
    var run = 1
    var j = 1
    while (j < n) {
      if (v(j) == v(j - 1)) { run += 1; if (run > best) best = run }
      else run = 1
      j += 1
    }
    best
  }

  private def hashString(w: String): Long = {
    var acc = Seed
    var c = 0
    while (c < w.length) {
      val cp = w.codePointAt(c)
      acc = (acc * 31 + cp) % Prime
      c += Character.charCount(cp)
    }
    acc
  }

  private def toArrayData(seen: java.util.LinkedHashSet[java.lang.Long]): ArrayData = {
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) {
      out(i) = it.next()
      i += 1
    }
    new GenericArrayData(out)
  }
}
