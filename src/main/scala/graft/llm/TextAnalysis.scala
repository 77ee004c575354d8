package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextHash._

/** Text-analysis operators for corpus curation: per-document statistics,
  * quality scoring, n-gram-heuristic language ID, token counting, and
  * content fingerprinting.
  *
  * Everything is a narrow per-row projection — no shuffle at any scale —
  * built from Catalyst built-ins and higher-order functions (no UDFs), so
  * the operators stay codegen-adjacent and are oracle-checked in DuckDB.
  * Integer counts and ratios-of-integers keep the float math deterministic.
  */
object TextAnalysis {

  /** Default stopword list for ratio features (pluggable per corpus). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Language marker tables for [[langId]]. Real deployments load
    * per-language stopword/character-profile tables; these defaults
    * partition the synthetic corpus vocabulary so the heuristic is
    * exercised end-to-end with deterministic, non-constant output. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "table", "row", "value", "query"),
    "de" -> Seq("data", "batch", "window", "stream", "merge", "group"),
    "fr" -> Seq("join", "filter", "sort", "hash", "scan", "dup"),
    "es" -> Seq("key", "agg", "part", "column", "line", "vector"),
    "zh" -> Seq("spark", "order", "small", "big", "fast", "slow", "customer"))

  private def countIn(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words: _*)))

  /** BPE-ish regex tokenization: word pieces, numbers, or single
    * non-space symbols — the usual pre-tokenizer split shape. */
  def bpeishTokens(s: Column): Column =
    regexp_extract_all(s, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))

  /** Feature-hashed document vectors: (vec_id, features double[dim]) —
    * the no-vocabulary text vectorizer (HashingTF shape) that feeds raw
    * text corpora into the vector operators ([[Clustering]], [[Pca]],
    * [[Similarity]], [[Dedup.semantic]]). A zero-shuffle compiled
    * projection; counts are integers in doubles, so every downstream
    * micros-quantized pipeline stays exactly oracle-checkable. */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame =
    docs.select(col(idCol).as("vec_id"),
      graft.functions.HashFunctions.hashedFeatures(col(textCol), dim).as("features"))

  /** Per-document statistics:
    * (doc_id, n_chars, n_tokens, n_distinct_tokens, n_bpeish_tokens,
    *  token_chars, distinct_ratio, stopword_ratio, alpha_ratio).
    *
    * Backed by the compiled [[graft.functions.GraftHashOps.textStats]]
    * kernel (one pass over the text), expanded through `inline` so the
    * kernel runs once per row — a plain multi-column projection would
    * re-invoke it per output column (CollapseProject re-inlines shared
    * subexpressions). Value parity with the expression formulation is
    * pinned by TextAnalysisSpec. */
  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      inline(array(graft.functions.HashFunctions.textStats(col(textCol), Stopwords))))

  /** N-gram-heuristic language ID: score = marker-token hits per language,
    * prediction = argmax with fixed tie order (declaration order of
    * [[LangMarkers]]). Returns (doc_id, passThrough..., score_<lang>...,
    * predicted_lang).
    *
    * `passThrough` carries source columns (e.g. a ground-truth label)
    * alongside the prediction so downstream comparisons stay a pure
    * projection — joining the prediction back to the source on doc_id
    * would re-scan and re-shuffle the corpus for a column that is
    * already in the row. */
  def langId(docs: DataFrame, idCol: String, textCol: String,
      passThrough: Seq[String] = Nil): DataFrame = {
    // pass-through names must not collide with the generated output
    // columns — a duplicate would make the result ambiguous downstream
    val reserved = "doc_id" +: "predicted_lang" +:
      LangMarkers.map { case (lang, _) => s"score_$lang" }
    val clashes = passThrough.intersect(reserved) ++
      passThrough.diff(passThrough.distinct)
    require(clashes.isEmpty,
      s"langId passThrough collides with generated/duplicate columns: ${clashes.mkString(", ")}")
    // bindOnce: one tokenizer run per row feeds all language scores and
    // the argmax chain (each would otherwise re-inline the split)
    docs.select(
      (col(idCol).as("doc_id") +: passThrough.map(col)) :+
      bindOnce(wordTokens(col(textCol)), tokens => {
        val scores = LangMarkers.map { case (lang, words) => lang -> countIn(tokens, words) }
        // argmax with declaration-order ties: a chain of strict > comparisons
        val predicted = scores.foldLeft((lit(""), lit(-1L): Column)) {
          case ((bestLang, bestScore), (lang, score)) =>
            (when(score > bestScore, lit(lang)).otherwise(bestLang),
              when(score > bestScore, score.cast("long")).otherwise(bestScore))
        }._1
        struct(
          scores.map { case (lang, s) => s.cast("long").as(s"score_$lang") } :+
            predicted.as("predicted_lang"): _*)
      }).as("l"): _*)
      .select((("doc_id" +: passThrough) :+ "l.*").map(col): _*)
  }

  /** Composite quality score in [0,1] with a 3-way bucket:
    * length saturation, lexical diversity, stopword-rate band, and
    * mean token length band — the usual cheap corpus-quality features
    * (cf. Gopher/C4-style filters). Deterministic double arithmetic. */
  def qualityScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      passThrough: Seq[String] = Nil): DataFrame = {
    val reserved = Seq("doc_id", "quality_score", "quality_bucket")
    val clashes = passThrough.intersect(reserved) ++
      passThrough.diff(passThrough.distinct)
    require(clashes.isEmpty,
      s"qualityScore passThrough collides with generated/duplicate columns: ${clashes.mkString(", ")}")
    def scoreOf(tokens: Column): Column = {
      val nTokens = size(tokens)
      val lengthTerm = least(nTokens, lit(50)).cast("double") / 50.0
      val diversityTerm = size(array_distinct(tokens)).cast("double") / nTokens
      val stopRatio = countIn(tokens, Stopwords).cast("double") / nTokens
      val stopTerm = when(stopRatio.between(0.02, 0.5), lit(1.0)).otherwise(lit(0.0))
      val meanLen = aggregate(tokens, lit(0L), (acc, x) => acc + length(x)).cast("double") / nTokens
      val lenBandTerm = when(meanLen.between(2.0, 10.0), lit(1.0)).otherwise(lit(0.0))
      lengthTerm * 0.25 + diversityTerm * 0.25 + stopTerm * 0.25 + lenBandTerm * 0.25
    }
    // bindOnce ×2: one tokenizer run and one score evaluation per row
    // (CollapseProject would re-inline the split per referencing term)
    docs.select(
      (col(idCol).as("doc_id") +: passThrough.map(col)) :+
      bindOnce(wordTokens(col(textCol)), t =>
        bindOnce(scoreOf(t), s =>
          struct(
            s.as("quality_score"),
            when(s >= 0.7, "high").when(s >= 0.4, "medium").otherwise("low")
              .as("quality_bucket")))).as("q"): _*)
      .select((("doc_id" +: passThrough) :+ "q.*").map(col): _*)
  }

  /** Corpus vocabulary statistics: per token, total occurrences (`tf`) and
    * document frequency (`df`), top `limit` by tf (ties by token). The
    * input to tokenizer training and IDF weighting; emits raw integer
    * counts — downstream weights (log-IDF etc.) are a trivial projection,
    * and keeping the oracle-compared surface integer-only avoids
    * cross-engine `ln` last-ulp hazards.
    *
    * One explode + one shuffle on the token (partial aggregation combines
    * map-side); the top-k is taken FIRST via `orderBy+limit`
    * (TakeOrderedAndProject — per-partition top-k, k-row driver merge),
    * and only then does the global `row_number` window rank the <= limit
    * surviving rows. */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String, limit: Int = 100): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("tf").desc, col("token").asc)
    docs
      .select(col(idCol).as("doc_id"), explode(wordTokens(col(textCol))).as("token"))
      // two-level aggregation instead of count+count_distinct in one agg:
      // the distinct-aggregate form plans an Expand (2x rows through the
      // shuffle), while (token, doc) pre-aggregation map-side-combines a
      // document's repeated tokens before anything ships
      .groupBy("token", "doc_id").agg(count(lit(1)).as("c"))
      .groupBy("token")
      .agg(sum(col("c")).as("tf"), count(lit(1)).as("df"))
      // top-k FIRST (TakeOrderedAndProject: per-partition top-k, then a
      // k-row merge on the driver side) so the global rank window runs
      // over <= limit rows, never the whole vocabulary
      .orderBy(col("tf").desc, col("token").asc)
      .limit(limit)
      .withColumn("rank", row_number().over(w))
  }

  /** Overlapping context-window chunking — the document splitter every
    * pretraining/RAG pipeline runs before packing or embedding. Chunks of
    * `chunkTokens` tokens start every `chunkTokens - overlap` tokens; the
    * final chunk is the first one reaching the end (short documents yield
    * exactly one chunk). A per-row explode with replication factor
    * ~1/(1-overlap/chunk) — no shuffle; all boundary arithmetic is
    * integer, so the operator is oracle-exact.
    * Returns (doc_id, chunk_idx, n_chunk_tokens, chunk_text). */
  def chunk(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int = 64,
      overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    docs
      .select(
        col(idCol).as("doc_id"),
        bindOnce(wordTokens(col(textCol)), t => {
          val n = size(t)
          // 1 + ceil((n - chunkTokens) / stride) for n > chunkTokens, else 1
          val nChunks = when(n <= chunkTokens, lit(1))
            .otherwise(lit(1) + floor((n - chunkTokens + stride - 1) / stride).cast("int"))
          transform(sequence(lit(0), nChunks - 1), ci =>
            struct(
              ci.as("chunk_idx"),
              (least(ci * stride + chunkTokens, n) - ci * stride).as("n_chunk_tokens"),
              concat_ws(" ", slice(t, ci * stride + 1,
                least(lit(chunkTokens), n - ci * stride))).as("chunk_text")))
        }).as("chunks"))
      .select(col("doc_id"), explode(col("chunks")).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.n_chunk_tokens"), col("c.chunk_text"))
  }

  /** Gopher-style repetition signals, entirely per-row (no shuffle):
    * top-token fraction (longest multiplicity over the hashed token
    * multiset — a compiled sort+scan kernel, not an explode+groupBy that
    * would ship every token) and duplicate-2/3-gram fractions
    * (1 − distinct/total gram occurrences). High values mark the
    * degenerate boilerplate/looping text the Gopher rules filter.
    * Returns (doc_id, n_tokens, top_token_count, top_token_ratio,
    * dup_bigram_ratio, dup_trigram_ratio). */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.HashFunctions
    import TextHash.bindOnce
    def dupRatio(distinctGrams: Column, total: Column): Column =
      when(total <= 0, lit(0.0))
        .otherwise(lit(1.0) - distinctGrams.cast("double") / total)
    // bindOnce: token hashing and the run-count kernel each evaluate once
    // per row (CollapseProject would re-inline them per referencing field)
    docs
      .select(
        col(idCol).as("doc_id"),
        bindOnce(HashFunctions.tokenHashes(col(textCol)), th =>
          bindOnce(HashFunctions.topRunCount(th), tc =>
            struct(
              size(th).as("n_tokens"),
              tc.as("top_token_count"),
              (tc.cast("double") / size(th)).as("top_token_ratio"),
              dupRatio(size(HashFunctions.ngramHashes(col(textCol), 2)), size(th) - 1)
                .as("dup_bigram_ratio"),
              dupRatio(size(HashFunctions.ngramHashes(col(textCol), 3)), size(th) - 2)
                .as("dup_trigram_ratio")))).as("r"))
      .select("doc_id", "r.*")
  }

  /** PII-pattern flags (C4-style cleaning signal): counts of email-,
    * phone-, and IPv4-shaped substrings plus a combined flag. Patterns
    * stick to character classes and bounded quantifiers, the regex subset
    * Java (Spark) and RE2 (DuckDB/production scanners) match identically;
    * non-overlapping left-to-right counting is the shared semantics of
    * `regexp_count` / `regexp_extract_all`. A pure projection — no
    * shuffle, codegen-friendly. Returns
    * (doc_id, n_emails, n_phones, n_ips, has_pii). */
  /** The shared PII patterns (the Java/RE2-identical regex subset). */
  val EmailRx = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRx = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
  val IpRx = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  def piiFlags(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val emails = regexp_count(t, lit(EmailRx))
    val phones = regexp_count(t, lit(PhoneRx))
    val ips = regexp_count(t, lit(IpRx))
    docs.select(
      col(idCol).as("doc_id"),
      emails.cast("long").as("n_emails"),
      phones.cast("long").as("n_phones"),
      ips.cast("long").as("n_ips"),
      (emails + phones + ips > 0).as("has_pii"))
  }

  /** PII REDACTION — the apply side of [[piiFlags]] (training corpora
    * replace the spans, they don't just count them): sequential
    * replace-all of email → phone → IPv4 matches with typed placeholders.
    * The order is part of the contract (an email's digits are gone before
    * the phone/IP patterns run) and both engines replace left-to-right
    * non-overlapping, so the output is exactly mirrorable. A pure
    * codegen projection (`regexp_replace` built-ins — no kernel needed).
    * Returns (doc_id, red_text, redacted). */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val red = regexp_replace(
      regexp_replace(
        regexp_replace(col(textCol), lit(EmailRx), lit("<EMAIL>")),
        lit(PhoneRx), lit("<PHONE>")),
      lit(IpRx), lit("<IP>"))
    docs.select(
      col(idCol).as("doc_id"),
      red.as("red_text"),
      (col(textCol).isNotNull && red =!= col(textCol)).as("redacted"))
  }

  /** Corpus-specific stopword discovery: tokens whose document frequency
    * exceeds `minDfRatio` of the corpus — the data-driven replacement for
    * a fixed stopword list when corpora shift domain. One distinct-token
    * explode + one aggregation + a broadcast one-row totals join; exact
    * integer ratio. Returns (token, df, df_ratio). */
  def stopwordCandidates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDfRatio: Double = 0.5): DataFrame = {
    val totals = docs.agg(count(lit(1)).as("n_docs"))
    docs
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(wordTokens(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(totals))
      .withColumn("df_ratio", col("df").cast("double") / col("n_docs"))
      .filter(col("df_ratio") >= minDfRatio)
      .select("token", "df", "df_ratio")
  }

  /** Adjacent-token-pair frequencies — the BPE merge-candidate table
    * (tokenizer training ranks merges by exactly these counts). Same
    * shape as [[vocabulary]]: one explode + one shuffle on the pair
    * (map-side partial agg combines first); the final top-k is a
    * TakeOrderedAndProject, not a global sort. Pairs keep occurrence
    * multiplicity (a distinct-gram set would undercount merges).
    * Returns (pair, tf, df, rank). */
  def pairVocabulary(docs: DataFrame, idCol: String, textCol: String, limit: Int = 100): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("tf").desc, col("pair").asc)
    docs
      .select(
        col(idCol).as("doc_id"),
        explode(bindOnce(wordTokens(col(textCol)), t =>
          when(size(t) >= 2,
            transform(sequence(lit(1), size(t) - 1), i =>
              concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
            .otherwise(array().cast("array<string>")))).as("pair"))
      .groupBy("pair", "doc_id").agg(count(lit(1)).as("c")) // see vocabulary: avoids the Expand
      .groupBy("pair")
      .agg(sum(col("c")).as("tf"), count(lit(1)).as("df"))
      // see vocabulary: bound the global rank window by the top-k first
      .orderBy(col("tf").desc, col("pair").asc)
      .limit(limit)
      .withColumn("rank", row_number().over(w))
  }

  /** Full winnowing fingerprints (Schleimer/Wilkerson/Aiken local
    * sampling): every `w`-window minimum of the positional k-gram rolling
    * hashes, exploded to one row per distinct fingerprint — the standard
    * position-robust document sketch for plagiarism/near-dup detection
    * (guarantees a shared fingerprint for any match of length >= k+w-1).
    * Purely per-row compute (compiled kernel, O(n) deque) + an explode:
    * no shuffle at all until a consumer aggregates. Returns
    * (doc_id, fingerprint). */
  def winnow(docs: DataFrame, idCol: String, textCol: String, k: Int = 8, w: Int = 4): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      explode(graft.functions.HashFunctions.winnowHashes(col(textCol), k, w)).as("fingerprint"))

  /** Vocabulary-growth (Heaps'-law) curve — "after the first `c` tokens
    * of the corpus, how many distinct tokens have appeared?" at
    * `nCheckpoints` evenly spaced prefixes. The curve is what sizes a
    * tokenizer vocabulary / estimates OOV decay before committing to a
    * vocab budget (Heaps 1978: V(n) ≈ K·n^β).
    *
    * Dataflow (all corpus-sized steps shuffle once each):
    *  1. global token positions via the range-parallel two-phase prefix
    *     sum over doc order ([[graft.scale.Prefix]] — never the
    *     single-partition global window); the token arrays ride the one
    *     range exchange (the L42 sequence-packing posture);
    *  2. `min(global_pos)` per token — ONE token-keyed shuffle with
    *     map-side combine;
    *  3. checkpoint counts as conditional sums in a single aggregation
    *     over the (vocabulary-sized) first-occurrence table, checkpoints
    *     derived from the broadcast 1-row total (integer `DIV`, so both
    *     engines cut identically).
    *
    * Returns (checkpoint_no, checkpoint_tokens, n_distinct), one row per
    * checkpoint: distinct tokens whose first occurrence lies strictly
    * before the checkpoint position. Doc ids must be unique (the prefix
    * order). */
  def vocabGrowth(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nCheckpoints: Int = 8): DataFrame = {
    require(nCheckpoints >= 1, "vocabGrowth: need at least one checkpoint")
    val tokList = split(trim(col(textCol)), "\\s+")
    val counts = docs.select(
      col(idCol).as("doc_id"),
      when(col(textCol).isNull, lit(0L)).otherwise(size(tokList).cast("long"))
        .as("n_t"),
      tokList.as("__t"))
    val offs = graft.scale.Prefix
      .exclusiveRunningTotal(counts, "doc_id", "n_t", "off")
    val firsts = offs
      .select(col("off"), posexplode(col("__t")).as(Seq("pos", "token")))
      .groupBy("token")
      .agg(min(col("off") + col("pos")).as("first_pos"))
    val totals = counts.agg(sum("n_t").as("__n"))
    val aggs = max(col("__n")).as("__n") +:
      (1 to nCheckpoints).map(i =>
        sum(when(col("first_pos") < expr(s"__n * $i DIV $nCheckpoints"), 1L)
          .otherwise(0L)).as(s"__nd_$i"))
    firsts.crossJoin(broadcast(totals))
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array((1 to nCheckpoints).map(i =>
        struct(
          lit(i).as("checkpoint_no"),
          expr(s"__n * $i DIV $nCheckpoints").as("checkpoint_tokens"),
          coalesce(col(s"__nd_$i"), lit(0L)).as("n_distinct"))): _*)).as("c"))
      .select("c.*")
  }

  /** Taxonomy/domain tagging — count each topic's keyword occurrences per
    * document in ONE text scan ([[graft.functions.GraftKeywordOps]]
    * Aho–Corasick kernel over the literal keyword set; a per-keyword SQL
    * formulation scans the text once PER keyword). Zero shuffle: the
    * count vector is a projection, the per-topic sums are column
    * arithmetic over it, and the topic rows come from exploding a
    * bounded literal-sized struct array. A keyword may serve several
    * topics (counted for each); matches are all-start-position
    * (overlapping) substring occurrences over code points — the exact
    * semantics the DuckDB mirror reproduces.
    *
    * Returns (doc_id, topic, n_matches, n_keywords) — `n_keywords` =
    * how many of the topic's keywords matched at least once. */
  def tagTaxonomy(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      taxonomy: Seq[(String, Seq[String])]): DataFrame = {
    require(taxonomy.nonEmpty && taxonomy.forall(_._2.nonEmpty),
      "tagTaxonomy: every topic needs at least one keyword")
    require(taxonomy.map(_._1).distinct.length == taxonomy.length,
      "tagTaxonomy: duplicate topic names")
    val kws = taxonomy.flatMap(_._2).distinct
    val kwIdx = kws.zipWithIndex.toMap
    docs
      .select(
        col(idCol).as("doc_id"),
        graft.functions.GraftKeywordOps
          .keywordCountsKernel(col(textCol), kws).as("__kc"))
      .select(col("doc_id"),
        explode(array(taxonomy.map { case (topic, tkws) =>
          val cnts = tkws.map(k => element_at(col("__kc"), kwIdx(k) + 1))
          struct(
            lit(topic).as("topic"),
            cnts.reduce(_ + _).as("n_matches"),
            cnts.map(c => when(c > 0, 1L).otherwise(0L)).reduce(_ + _)
              .as("n_keywords"))
        }: _*)).as("t"))
      .select(col("doc_id"), col("t.topic"), col("t.n_matches"),
        col("t.n_keywords"))
  }

  /** Content fingerprints: full-text polynomial hash plus min/max 8-gram
    * rolling hashes (a 1-permutation MinHash sketch — the winnowing
    * building block). Returns (doc_id, content_hash, min_gram_hash,
    * max_gram_hash). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String, k: Int = 8): DataFrame = {
    val gramHashes = graft.functions.HashFunctions.shingleHashes(col(textCol), k)
    docs.select(
      col(idCol).as("doc_id"),
      graft.functions.HashFunctions.polyHash(col(textCol)).as("content_hash"),
      array_min(gramHashes).as("min_gram_hash"),
      array_max(gramHashes).as("max_gram_hash"))
  }

  /** Text normalization (GRAFT-CLEAN v1) — the fix-the-bytes pass before
    * any hashing/shingling/tokenization: Unicode NFC
    * ([[graft.functions.GraftUnicodeOps]] kernel — precomposed and
    * decomposed spellings of the same text must dedup identically), then
    * strip the C0 controls except `\n`/`\t`, plus DEL (`regexp_replace`,
    * a codegen built-in). Appends `clean_text` and a `changed` flag (the
    * corpus-health signal: what fraction of a drop needed fixing).
    * Zero-shuffle scan projection; exact-hash mirrorable (DuckDB
    * `nfc_normalize` + the same RE2 class). */
  def cleanText(docs: DataFrame, textCol: String): DataFrame = {
    val cleaned = regexp_replace(
      graft.functions.GraftUnicodeOps.nfcCol(col(textCol)),
      "[\\x00-\\x08\\x0B-\\x1F\\x7F]", "")
    docs
      .withColumn("clean_text", cleaned)
      .withColumn("changed", col(textCol).isNotNull && col("clean_text") =!= col(textCol))
  }

  /** URL feature projection over a URL column (crawl curation's per-doc
    * derivations — GRAFT-URL v1 / GRAFT-PSL v1 kernels,
    * [[graft.functions.GraftUrlOps]]): appends `host`, `url_canon` (the
    * dedup key) and `domain` (the registrable domain — the per-domain-cap
    * / mixture-accounting stratum). Zero shuffles: everything happens
    * inside the scan projection. `suffixes` overrides the built-in
    * compact suffix sample with a real Public Suffix List table (one
    * string column; dimension-sized — it collects to a literal the
    * per-thread kernel memo parses once). */
  def withRegistrableDomain(
      docs: DataFrame,
      urlCol: String,
      suffixes: Option[DataFrame] = None): DataFrame = {
    import graft.functions.GraftUrlOps
    val csv = suffixes match {
      case None => GraftUrlOps.DefaultSuffixes
      case Some(df) =>
        val s = df.collect().map(_.getString(0)).filter(_.nonEmpty)
        require(s.nonEmpty, "withRegistrableDomain: empty suffix table")
        s.mkString(",")
    }
    val host = GraftUrlOps.urlHostCol(col(urlCol))
    docs
      .withColumn("host", host)
      .withColumn("url_canon", GraftUrlOps.urlCanonicalCol(col(urlCol)))
      .withColumn("domain", GraftUrlOps.registrableDomainCol(col("host"), csv))
  }
}
