package graft.scale

import graft.llm.TextHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom-filter semi-join — the explicit form of the
  * runtime-filter pattern for joining a huge fact table against a
  * dimension too large to broadcast but far smaller than the fact side.
  *
  * The filter itself is ordinary relational data: `nWords` 64-bit words
  * built by hashing each dimension key with `numHashes` members of the
  * same SQL-expressible universal family as [[TextHash.minhashSignature]]
  * (`((k % P) * (2i+1) + (i*i+1)) % P % mBits` — pure integer arithmetic,
  * no engine-native hash), OR-folded into one map row and broadcast. The
  * fact side probes all `numHashes` bits in a single projection and only
  * candidate rows reach the exact `left_semi` join.
  *
  * Because a Bloom filter has no false negatives, the operator's OUTPUT is
  * exactly the plain semi-join — which is what the DuckDB oracle checks
  * (any bit-logic bug would drop rows and fail the hash compare). The
  * bloom's value is the shuffle it avoids: non-candidate fact rows never
  * leave their scan partition, so the exact join shuffles only
  * |candidates| ≈ |matches| + fpp·|fact| rows. Pruning is asserted in
  * BloomSpec; fpp ≈ (1 - e^(-numHashes·n/mBits))^numHashes.
  *
  * Spark's own `df.stat.bloomFilter` collects the filter to the driver
  * and is not expressible to the oracle; AQE's runtime bloom pushdown
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) covers the same
  * pattern transparently when statistics discover it — this operator is
  * the declarative, engine-portable form the pipeline can rely on
  * unconditionally.
  */
object Bloom {

  private val P = TextHash.Prime

  /** The i-th bit position for key `k` (pmod keeps negatives in range). */
  private def bitPos(k: Column, i: Int, mBits: Int): Column =
    pmod(pmod(pmod(k, lit(P)) * (2 * i + 1) + (i * i + 1), lit(P)), lit(mBits.toLong))

  /** Build the filter: one row, `bf: map<int, long>` of word-index →
    * OR-folded bits plus the key count. `mBits` must be a multiple of 64. */
  def build(keys: DataFrame, keyCol: String, mBits: Int, numHashes: Int): DataFrame = {
    require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
    require(numHashes >= 1, "need at least one hash")
    keys
      .select(explode(array((0 until numHashes).map(i =>
        bitPos(col(keyCol).cast("long"), i, mBits)): _*)).as("pos"))
      .select((col("pos") / 64).cast("int").as("word_idx"),
        // functions.shiftleft only accepts a literal shift; the SQL
        // ShiftLeft expression takes a column
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int")).as("bit"))
      .groupBy("word_idx")
      // bit_or is the OR-fold; map-side partial agg collapses each
      // partition to <= nWords rows before the (tiny) shuffle
      .agg(bit_or(col("bit")).as("bits"))
      .agg(map_from_entries(collect_list(struct(col("word_idx"), col("bits")))).as("bf"))
  }

  /** Probe expression: true iff every hash bit of `key` is set in `bf`. */
  def mightContain(bf: Column, key: Column, mBits: Int, numHashes: Int): Column =
    (0 until numHashes).map { i =>
      val pos = bitPos(key.cast("long"), i, mBits)
      call_function("shiftright",
        coalesce(element_at(bf, (pos / 64).cast("int")), lit(0L)),
        (pos % 64).cast("int")).bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)

  /** Bloom-prefiltered exact semi-join: `fact` rows whose `keyCol` appears
    * in `dim`. Identical output to `fact.join(dim, keys, "left_semi")`;
    * the bloom probe drops definite non-members before the join shuffle.
    *
    * @param mBits     filter size in bits (multiple of 64); size for
    *                  ~10 bits/key for ~1% fpp at numHashes=7
    * @param numHashes hash functions per key
    */
  def semiJoin(
      fact: DataFrame,
      dim: DataFrame,
      keyCol: String,
      mBits: Int = 1 << 16,
      numHashes: Int = 5): DataFrame = {
    val dimKeys = dim.select(col(keyCol)).distinct()
    val bf = build(dimKeys, keyCol, mBits, numHashes)
    fact
      .crossJoin(broadcast(bf))
      .filter(mightContain(col("bf"), col(keyCol), mBits, numHashes))
      .drop("bf")
      .join(dimKeys, Seq(keyCol), "left_semi")
  }
}
