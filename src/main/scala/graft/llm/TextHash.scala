package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable, oracle-checkable text hashing primitives.
  *
  * Every hash here is defined by pure integer arithmetic over character
  * codes (polynomial rolling hash, base 31, modulo a 30-bit prime) instead
  * of engine-native hashes (`xxhash64`, `murmur3`): the driver's
  * correctness gate re-runs each query in DuckDB, so the hash function must
  * be expressible — and bit-identical — in ANSI-ish SQL on both engines.
  * All expressions are Catalyst built-ins / higher-order functions (zero
  * UDFs), so they stay inside Tungsten-evaluated rows at scale.
  *
  * Overflow safety: accumulators stay below `Prime` (< 2^30); a fold step
  * computes `acc * 31 + code <= 2^30 * 31 + 127 < 2^35`, far inside Long.
  * The largest multiplier used by MinHash perms is 127 (`2*63+1`), giving
  * `127 * 2^30 < 2^37` — no wraparound anywhere.
  */
object TextHash {

  /** 30-bit prime modulus (1e9+7) shared by all hashes and permutations. */
  val Prime = 1000000007L

  /** Polynomial-hash seed; prepended before folding character codes. */
  val Seed = 7L

  private val P = lit(Prime)

  /** `h(s) = fold(chars(s), 7, (acc, c) => (acc*31 + c) % Prime)`.
    *
    * SQL mirror (DuckDB):
    * {{{
    * list_reduce(list_prepend(CAST(7 AS BIGINT),
    *   list_transform(generate_series(1, len(s)), i -> CAST(ascii(substr(s,i,1)) AS BIGINT))),
    *   (a,c) -> (a*31+c) % 1000000007)
    * }}}
    */
  def polyHash(s: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(s)), i => ascii(s.substr(i, lit(1))).cast("long")),
      lit(Seed),
      (acc, c) => (acc * 31L + c) % P)

  /** Distinct character k-grams ("shingles") of `s`, in first-occurrence
    * order. Order is NOT portable across engines (DuckDB's `list_distinct`
    * reorders) — callers must only use order-insensitive reductions
    * (min / counts), never emit the array itself to an oracle-checked
    * output. */
  def charShingles(s: Column, k: Int): Column =
    when(length(s) >= k,
      array_distinct(transform(sequence(lit(1), length(s) - (k - 1)), i => s.substr(i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** Whitespace tokenization (the reference corpus is pre-normalized text;
    * see [[TextAnalysis.bpeishTokens]] for the punctuation-aware variant). */
  def wordTokens(s: Column): Column = split(trim(s), "\\s+")

  /** Word n-grams joined with single spaces, distinct. Same order caveat
    * as [[charShingles]]. */
  def wordNgrams(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      array_distinct(transform(sequence(lit(1), size(tokens) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(o => element_at(tokens, i + o)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Map an array of strings to their [[polyHash]]es. */
  def hashAll(strings: Column): Column = transform(strings, s => polyHash(s))

  /** POSITIONAL word n-gram hashes — one hash per start offset, duplicates
    * kept, array index = token position (the cross-document span-detection
    * input; [[wordNgrams]] is the distinct-set variant). Grams are joined
    * with single spaces before hashing, exactly like [[wordNgrams]], so the
    * hash values agree between the two forms. */
  def posNgramHashes(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(1), size(tokens) - (n - 1)), i =>
        polyHash(concat_ws(" ", (0 until n).map(o => element_at(tokens, i + o)): _*))))
      .otherwise(array().cast("array<long>"))

  /** POSITIONAL k-gram hashes (one per start offset, duplicates kept) —
    * the winnowing input; [[charShingles]] is the distinct-set variant. */
  def gramHashes(s: Column, k: Int): Column =
    when(length(s) >= k,
      transform(sequence(lit(1), length(s) - (k - 1)), i => polyHash(s.substr(i, lit(k)))))
      .otherwise(array().cast("array<long>"))

  /** Winnowing fingerprints: distinct minima of every `w`-wide sliding
    * window over [[gramHashes]], ascending (HOF reference form of
    * [[graft.functions.GraftHashOps.winnowHashes]]). */
  def winnowHashes(s: Column, k: Int, w: Int): Column =
    bindOnce(gramHashes(s, k), g =>
      when(size(g) >= w,
        array_sort(array_distinct(transform(sequence(lit(1), size(g) - (w - 1)), j =>
          array_min(slice(g, j, lit(w)))))))
        .otherwise(array().cast("array<long>")))

  /** MinHash signature: for permutation j in [0, perms),
    * `sig(j) = min over shingle hashes h of ((2j+1)*h + j*j+1) % Prime`.
    * Returns an array<long> of length `perms`. Universal-hash family with
    * odd multipliers, all constants SQL-expressible (no random state). */
  def minhashSignature(shingleHashes: Column, perms: Int): Column =
    bindOnce(shingleHashes, hs => // evaluate the input hashes once, not once per perm
      transform(sequence(lit(0), lit(perms - 1)), j =>
        array_min(transform(hs, h => (h * (j * 2 + 1) + (j * j + 1)) % P))))

  /** LSH band digests of a MinHash signature: `nBands` structs
    * `(band, band_hash)` where band_hash folds `rowsPerBand` consecutive
    * signature entries with the same base-31 fold as [[polyHash]].
    * Docs agreeing on any (band, band_hash) are candidate duplicates. */
  def bandDigests(sig: Column, nBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(nBands - 1)), b =>
      struct(
        b.as("band"),
        (0 until rowsPerBand)
          .foldLeft(lit(Seed): Column)((acc, r) =>
            (acc * 31L + element_at(sig, b * rowsPerBand + r + 1)) % P)
          .as("band_hash")))

  /** Let-binding idiom: evaluate `value` ONCE per row and pass it to
    * `body`. Catalyst's CollapseProject re-inlines projected expressions
    * into every downstream use, so an expensive array (e.g. a MinHash
    * signature) referenced k times would be recomputed k times; wrapping it
    * as the element of a 1-element array and mapping over it binds it to a
    * lambda variable, which is evaluated exactly once. */
  def bindOnce(value: Column, body: Column => Column): Column =
    element_at(transform(array(value), v => body(v)), 1)

  /** SimHash fingerprint over token hashes, `bits` wide (max 30: hashes are
    * uniform mod a 30-bit prime, so higher bits carry no entropy).
    * Each token occurrence votes ±1 per bit; the fingerprint sets bit i
    * when the vote sum is positive. */
  def simhash(tokenHashes: Column, bits: Int): Column = {
    require(bits <= 30, s"simhash bits must be <= 30, got $bits")
    bindOnce(tokenHashes, th => // evaluate token hashes once, not once per bit
      (0 until bits).map { i =>
        val vote = aggregate(
          th,
          lit(0L),
          (acc, h) => acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
        when(vote > 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _))
  }
}
