package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextHash._

/** Trainable byte-pair encoding (Sennrich, Haddow, Birch 2016) — the
  * tokenizer-training step of an LLM data pipeline, shaped the way the
  * production trainers (SentencePiece, HF tokenizers) shape it at scale:
  *
  *  - '''one''' distributed corpus pass builds the word histogram
  *    (`groupBy(word).count`, map-side combined), capped to the top
  *    `maxWords` by (count desc, word asc) — corpus word frequencies are
  *    Zipfian, so a ~10⁶-word cap covers ~99.9% of token mass at any
  *    corpus size and makes the merge training input dimension-sized;
  *  - merge training runs on the DRIVER over that histogram (the same
  *    discipline as [[Clustering]]'s driver-resident centroids): m
  *    rounds of weighted adjacent-pair counting → adopt the most
  *    frequent pair (ties: count desc, left asc, right asc) → re-segment
  *    the histogram. Never a per-round corpus pass — the corpus is
  *    touched exactly once regardless of merge count;
  *  - encoding is a compiled kernel ([[graft.functions.GraftBpeOps]])
  *    over a broadcast-literal merge table: a pure per-row projection,
  *    zero shuffle, with per-thread word memoization (Zipf again: nearly
  *    every word is a memo hit).
  *
  * Semantics contract (what the DuckDB oracle mirrors exactly): words
  * are whitespace tokens; a word starts as its character sequence;
  * training applies each adopted merge as ONE left-to-right
  * non-overlapping pass over every word; encoding applies the learned
  * merges in rank order with the same pass. (Heap-based encoders pick
  * the globally lowest-rank pair first; rank-order passes are the
  * original Sennrich formulation, deterministic, and self-consistent
  * with this trainer's segmentation.) Pair counting counts every
  * adjacent position, overlaps included.
  */
object Bpe {

  /** Train `merges` BPE merges; returns them in adoption order. Runs the
    * single histogram pass EAGERLY (collect of ≤ `maxWords` rows —
    * dimension-sized by the cap, same eager-model posture as
    * [[Classify.nbScoreWith]]). */
  def train(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Int,
      maxWords: Int = 100000): Seq[(String, String)] = {
    require(merges > 0 && maxWords > 0, "need merges > 0 and maxWords > 0")
    val hist: Array[(Array[String], Long)] = docs
      .select(explode(wordTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc).limit(maxWords)
      .collect()
      // symbolize by CODE POINT (the oracle's substr unit), not UTF-16
      // code unit — see GraftBpeOps.codePointSymbols
      .map(r => (graft.functions.GraftBpeOps.codePointSymbols(r.getString(0)), r.getLong(1)))
    var words = hist
    val adopted = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < merges && !exhausted) {
      val pairCounts = new java.util.HashMap[(String, String), Array[Long]]()
      words.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val key = (syms(i), syms(i + 1))
          val cur = pairCounts.get(key)
          if (cur != null) cur(0) += cnt else pairCounts.put(key, Array(cnt))
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // tie-break in UTF-8 BYTE order, the collation of both the
        // oracle's ORDER BY and Spark's own string sort — Java String <
        // is UTF-16 order, which disagrees for code points in
        // [U+E000, U+FFFF] vs supplementary-plane symbols
        def u8Lt(a: String, b: String): Boolean =
          org.apache.spark.unsafe.types.UTF8String.fromString(a)
            .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0
        var best: (String, String) = null
        var bestCnt = -1L
        val it = pairCounts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val c = e.getValue()(0)
          val k = e.getKey
          if (c > bestCnt || (c == bestCnt &&
            (u8Lt(k._1, best._1) || (k._1 == best._1 && u8Lt(k._2, best._2))))) {
            best = k; bestCnt = c
          }
        }
        adopted += best
        words = words.map { case (syms, cnt) =>
          (graft.functions.GraftBpeOps.applyMerge(syms, best._1, best._2), cnt)
        }
        round += 1
      }
    }
    adopted.result()
  }

  /** [[train]] as a DataFrame for the driver gate:
    * (rank, lhs, rhs, merged). */
  def trainDf(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Int,
      maxWords: Int = 100000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, idCol, textCol, merges, maxWords)
      .zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r, l + r) }
      .toDF("rank", "lhs", "rhs", "merged")
  }

  /** Encode every document with a trained merge table: ZERO-shuffle pure
    * projection emitting (doc_id, n_tokens, tokens_hash) — `tokens_hash`
    * is the order-sensitive polynomial fold of the per-token
    * [[TextHash.polyHash]]es, the portable fingerprint of the exact
    * token sequence (arrays themselves are never emitted, per the oracle
    * discipline). */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val P = lit(TextHash.Prime)
    docs.select(
      col(idCol).as("doc_id"),
      bindOnce(graft.functions.GraftBpeOps.bpeEncode(col(textCol), merges), toks =>
        struct(
          size(toks).cast("long").as("n_tokens"),
          aggregate(toks, lit(TextHash.Seed), (acc, t) =>
            (acc * 31L + polyHash(t)) % P).as("tokens_hash"))).as("b"))
      .select(col("doc_id"), col("b.n_tokens").as("n_tokens"),
        col("b.tokens_hash").as("tokens_hash"))
  }
}
