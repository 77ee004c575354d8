package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextHash._

/** Ranked keyword retrieval over the corpus: inverted index construction
  * and BM25 scoring — the lexical-search half of a training-data /RAG
  * stack (embedding ANN in [[Similarity]] is the other half).
  *
  * Scale shape: the query-term filter lands BEFORE the shuffle — postings
  * explode per token, but only tokens in the (tiny, literal) query set
  * survive to the `groupBy`, so shuffle volume is O(matching postings),
  * not O(corpus tokens). Corpus statistics (df per term, N, total token
  * count) are dimension-sized and broadcast. The final top-k is a
  * `TakeOrderedAndProject` (orderBy + limit), never a global sort.
  *
  * Determinism (oracle rules, see [[graft.queries.LlmQueries]]): per-term
  * scores are rounded to integer micros and summed as longs — long
  * addition is order-independent where double summation is not — and the
  * top-k tiebreak is total (score desc, doc_id asc). Two idf modes:
  * `logIdf = true` (default) is the classic Robertson–Spärck Jones
  * `ln(1 + (N - df + 0.5)/(df + 0.5))`; `logIdf = false` uses the raw
  * rational `(N - df + 0.5)/(df + 0.5)` — same sign and ordering per
  * term, but free of `ln`, whose last-ulp rounding is the one piece of
  * libm the two engines do not contractually share. The oracle checks the
  * rational mode; the specs pin that both modes rank identically on the
  * test corpus (cf. the exact-vs-approx percentile precedent).
  */
object Retrieval {

  /** Inverted index: one posting row per (token, document) with term
    * frequency and the document's token length riding along (length is
    * needed by every scorer; carrying it here saves the doc-length join).
    * Returns (token, doc_id, tf, dl). */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(
        col(idCol).as("doc_id"),
        bindOnce(wordTokens(col(textCol)), t =>
          struct(size(t).as("dl"), t.as("toks"))).as("s"))
      .select(col("doc_id"), col("s.dl").as("dl"), explode(col("s.toks")).as("token"))
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))

  /** BM25 top-k documents for a bag of query terms.
    *
    * @param k1      term-frequency saturation (BM25 k1)
    * @param b       length normalization (BM25 b)
    * @param logIdf  classic log idf (default) vs the oracle-exact rational
    *                idf — see the object doc
    * @return (doc_id, n_matched_terms, score_micros, rank), rank <= k
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75,
      logIdf: Boolean = true): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    // ONE tokenizer pass feeds BOTH the postings and the corpus stats:
    // the narrow (doc_id, dl, query-term tokens) projection is
    // materialized once (a few bytes/doc — never the text or the full
    // token list), where the previous shape re-tokenized the whole
    // corpus a second time just for corpusStats' (n_docs, total_tokens)
    // row (guide §2.3: never pay a corpus pass twice for two statistics
    // of the same scan). Postings stay restricted to the query terms
    // BEFORE the (token, doc) shuffle — the index over non-query tokens
    // never materializes.
    val base = docs
      .select(
        col(idCol).as("doc_id"),
        bindOnce(wordTokens(col(textCol)), t =>
          struct(size(t).as("dl"), filter(t, tok => tok.isin(queryTerms: _*)).as("toks"))).as("s"))
      .select(col("doc_id"), col("s.dl").as("dl"), col("s.toks").as("toks"))
      .localCheckpoint()
    val postings = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("token"))
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))
    // corpus stats: N and total token count (for avgdl) — one row,
    // broadcast; sum(dl) ≡ corpusStats' sum(size(wordTokens(text)))
    // (size(NULL tokens) is NULL in both, skipped by sum)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_tokens"))
    score(postings, stats, k, k1, b, logIdf)
  }

  /** One-row corpus statistics (n_docs, total_tokens) — the mergeable
    * side table of a persisted index: each appended drop contributes its
    * own row, and [[bm25OverIndex]] sums them. */
  def corpusStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(wordTokens(col(textCol)))).as("total_tokens"))

  /** BM25 top-k over a PERSISTED index — the incremental-ingest shape of
    * [[bm25TopK]]: `postings` is any [[invertedIndex]]-schema table (the
    * union of separately-built drops; doc ids must be unique across
    * drops, so (token, doc_id) stays a key and per-term df is exact), and
    * `stats` any number of [[corpusStats]] rows, summed here. No text is
    * re-tokenized and nothing existing is rewritten when a drop arrives —
    * the drop's postings and stats row are appended, and the query-term
    * filter on the token column prunes the posting scan (at scale the
    * store is laid out sorted/partitioned by token, so the filter is a
    * file skip, the direct analogue of bm25TopK's pre-shuffle filter).
    * Produces bit-identically the ranking bm25TopK computes from the full
    * corpus — pinned by spec and by the driver oracle reusing q_bm25's
    * SQL. */
  def bm25OverIndex(
      postings: DataFrame,
      stats: DataFrame,
      queryTerms: Seq[String],
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75,
      logIdf: Boolean = true): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val restricted = postings.filter(col("token").isin(queryTerms: _*))
    val merged = stats.agg(
      sum(col("n_docs")).as("n_docs"),
      sum(col("total_tokens")).as("total_tokens"))
    score(restricted, merged, k, k1, b, logIdf)
  }

  /** Shared BM25 scoring core over query-term postings + one stats row. */
  private def score(
      postings: DataFrame,
      stats: DataFrame,
      k: Int,
      k1: Double,
      b: Double,
      logIdf: Boolean): DataFrame = {
    // df per query term — at most |queryTerms| rows, broadcast
    val dfs = postings.groupBy("token").agg(count(lit(1)).as("df"))
    val avgdl = col("total_tokens").cast("double") / col("n_docs")
    val rationalIdf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val idf = if (logIdf) log(lit(1.0) + rationalIdf) else rationalIdf
    val tfPart = (col("tf") * (k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    postings
      .join(broadcast(dfs), Seq("token"))
      .crossJoin(broadcast(stats))
      .select(
        col("doc_id"),
        round(idf * tfPart * 1e6).cast("long").as("term_score_micros"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_matched_terms"),
        sum(col("term_score_micros")).as("score_micros"))
      .orderBy(col("score_micros").desc, col("doc_id").asc)
      .limit(k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score_micros").desc, col("doc_id").asc)))
  }

  /** TF-IDF term weights per (document, term) over the whole vocabulary —
    * the classic retrieval/feature-extraction weighting. Same determinism
    * scheme as [[bm25TopK]]: the weight is emitted in integer micros, and
    * idf is the rational `N / df` family (`logIdf` adds the ln). One
    * explode + one (token, doc) shuffle; df/N broadcast back.
    * Returns (doc_id, token, tf, df, weight_micros). */
  def tfidf(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      logIdf: Boolean = true): DataFrame = {
    val postings = invertedIndex(docs, idCol, textCol)
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    val dfs = postings.groupBy("token").agg(count(lit(1)).as("df"))
    val rationalIdf = col("n_docs").cast("double") / col("df")
    val idf = if (logIdf) log(rationalIdf) else rationalIdf
    postings
      .join(dfs, Seq("token"))
      .crossJoin(broadcast(stats))
      .select(
        col("doc_id"), col("token"), col("tf"), col("df"),
        round((col("tf").cast("double") / col("dl")) * idf * 1e6).cast("long")
          .as("weight_micros"))
  }

  /** POSITIONAL inverted index: one `(token, doc_id, pos)` row per token
    * occurrence (0-based position). The layout phrase/proximity search
    * needs and [[invertedIndex]]'s tf rows cannot answer. Persist
    * hive-partitioned or bucketed by `token` at scale so a phrase query
    * reads only its own terms' postings. */
  def positionalIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(TextHash.wordTokens(col(textCol))).as(Seq("pos", "token")))
      .select("token", "doc_id", "pos")

  /** Exact-phrase search over a positional index: documents containing
    * the consecutive token sequence, with occurrence count and first
    * position. Term `i`'s postings are filtered BEFORE joining (the
    * pushdown-pruned read on a persisted index — no full-index scan) and
    * shifted by `-i`, so the phrase is k−1 `(doc_id, pos)` equi-joins
    * between single-term posting lists — each join side is one term's
    * postings, never the corpus. Returns (doc_id, n_matches,
    * first_pos). */
  def phraseSearch(index: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch needs at least one term")
    def postings(w: String, i: Int): DataFrame =
      index.filter(col("token") === w)
        .select(col("doc_id"), (col("pos") - i).as("pos"))
    val matched = phrase.zipWithIndex.tail
      .foldLeft(postings(phrase.head, 0)) { case (acc, (w, i)) =>
        acc.join(postings(w, i), Seq("doc_id", "pos"))
      }
    matched.groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"), min("pos").as("first_pos"))
  }

  /** PROXIMITY search over a positional index: documents where `termA`
    * and `termB` co-occur within `window` token positions (unordered).
    * Same pruned-posting shape as [[phraseSearch]]: each side reads one
    * term's postings, the pair test is a (doc_id) equi-join + distance
    * filter — per-doc posting lists are document-sized, never the
    * corpus. Returns (doc_id, n_pairs, min_dist). */
  def proximitySearch(
      index: DataFrame,
      termA: String,
      termB: String,
      window: Int): DataFrame = {
    require(termA != termB, "proximitySearch needs two distinct terms")
    require(window >= 1, s"window must be >= 1, got $window")
    val a = index.filter(col("token") === termA).select(col("doc_id"), col("pos").as("pa"))
    val b = index.filter(col("token") === termB).select(col("doc_id"), col("pos").as("pb"))
    a.join(b, Seq("doc_id"))
      .withColumn("dist", abs(col("pa") - col("pb")))
      .filter(col("dist") <= window)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pairs"), min("dist").as("min_dist"))
  }
}
