package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextHash._

/** Corpus deduplication operators for training-data pipelines.
  *
  * Four families, each shaped for a 1000-executor / 100 TB run:
  *
  *  - [[exact]]: hash-groupBy. One shuffle on a 64-bit content hash (never
  *    on the full text — shuffling multi-KB keys is the classic mistake at
  *    scale); full-text equality is re-checked inside each hash group, so a
  *    Prime-modulus collision cannot merge distinct documents.
  *  - [[minhashPairs]]: MinHash + banded LSH. Shingle → signature →
  *    band-digest explode → self-join on (band, digest) → exact-Jaccard
  *    verify. Cost is candidates-only, never all-pairs: the join key is the
  *    band digest, so co-bucketed docs hash to the same shuffle partition.
  *  - [[simhashFingerprints]] / [[simhashPairs]]: 24-bit SimHash; pair
  *    generation blocks on 6-bit sub-bands (any of 4 equal → candidate,
  *    the standard pigeonhole trick: hamming <= 3 guarantees a matching
  *    band), verified by exact `bit_count(xor)`.
  *  - [[ngramJaccardPairs]]: inverted-index join on word n-grams —
  *    `|A ∩ B|` is computed by counting gram co-occurrences in the join
  *    itself (one shuffle on gram, one on the pair), so the shingle sets
  *    are never rematerialized per pair. Prefix filtering (index only the
  *    `(1-t)·|d|+1` smallest grams) is the next refinement if gram
  *    frequencies skew; at the current corpus shape the full index is
  *    cheaper than the extra sort it requires.
  *
  * All arithmetic is SQL-portable (see [[TextHash]]) so every operator is
  * oracle-checked end-to-end by the driver's DuckDB gate.
  */
object Dedup {

  /** Exact duplicate groups: one row per distinct text with the surviving
    * (minimum) id and the number of copies. Callers keep `keep_id`.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), col(textCol), polyHash(col(textCol)).as("text_hash"))
      .groupBy(col("text_hash"), col(textCol)) // hash narrows the shuffle; text guards collisions
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("text_hash"), col("n_copies"))

  /** MinHash-LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * @param shingleK     character shingle width
    * @param perms        MinHash permutations (= nBands * rowsPerBand)
    * @param nBands       LSH bands; collision threshold ~ (1/nBands)^(1/rows)
    * @param rowsPerBand  signature rows folded per band
    * @param minJaccard   exact char-shingle Jaccard a candidate must meet
    * @return (doc_a, doc_b, jaccard), doc_a < doc_b
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 5,
      perms: Int = 64,
      nBands: Int = 16,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.5): DataFrame = {
    require(nBands * rowsPerBand == perms, "perms must equal nBands * rowsPerBand")
    val sh = docs.select(
      col(idCol).as("doc_id"),
      charShingles(col(textCol), shingleK).as("shingles"))
    // bindOnce: the 64-perm signature is evaluated once per row, not once
    // per band digest (CollapseProject would otherwise re-inline it 16x)
    val banded = sh
      .select(
        col("doc_id"),
        explode(bindOnce(
          minhashSignature(hashAll(col("shingles")), perms),
          sig => bandDigests(sig, nBands, rowsPerBand))).as("bd"))
      .select(col("doc_id"), col("bd.band").as("band"), col("bd.band_hash").as("band_hash"))
    val a = banded.select(col("band"), col("band_hash"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band"), col("band_hash"), col("doc_id").as("doc_b"))
    // candidates are bare id pairs — distinct never shuffles shingle arrays
    val candidates = a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct() // a pair may collide in several bands; verify once
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(col("sh_a")) + size(col("sh_b")) - inter
    candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), (inter.cast("double") / union).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Per-document SimHash fingerprint: (doc_id, simhash). */
  def simhashFingerprints(docs: DataFrame, idCol: String, textCol: String, bits: Int = 24): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      simhash(hashAll(wordTokens(col(textCol))), bits).as("simhash"))

  /** SimHash near-duplicate pairs: candidates share at least one `bandBits`
    * sub-band (pigeonhole: hamming <= nBands-1 always collides), verified
    * with exact hamming distance. Returns (doc_a, doc_b, hamming). */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int = 24,
      bandBits: Int = 6,
      maxHamming: Int = 2): DataFrame = {
    val nBands = bits / bandBits
    val fp = simhashFingerprints(docs, idCol, textCol, bits)
    val banded = fp.select(
      col("doc_id"),
      col("simhash"),
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), bandBits * b)
            .bitwiseAND(lit((1L << bandBits) - 1)).as("band_val"))): _*)).as("bv"))
      .select(col("doc_id"), col("simhash"), col("bv.band").as("band"), col("bv.band_val").as("band_val"))
    val a = banded.select(col("band"), col("band_val"), col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("band"), col("band_val"), col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("band", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Word n-gram Jaccard near-duplicate pairs via inverted-index join.
    * Returns (doc_a, doc_b, jaccard), doc_a < doc_b, jaccard >= minJaccard.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minJaccard: Double = 0.5): DataFrame = {
    val grams = docs.select(
      col(idCol).as("doc_id"),
      wordNgrams(wordTokens(col(textCol)), n).as("grams"))
    val sizes = grams.select(col("doc_id"), size(col("grams")).as("n_grams"))
    val postings = grams.select(col("doc_id"), explode(col("grams")).as("gram"))
    val shared = postings.as("x")
      .join(postings.as("y"), Seq("gram"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_grams").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_grams").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_shared").cast("double") / (col("na") + col("nb") - col("n_shared"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
