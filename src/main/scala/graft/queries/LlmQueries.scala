package graft.queries

import graft.llm._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-facing LLM-data-pipeline queries over the `documents`,
  * `embeddings`, and `events` tables, each with an exact DuckDB SQL mirror
  * in [[oracles]].
  *
  * Mirroring rules (same discipline as [[FloodQueries]]):
  *  - every hash is the portable polynomial fold of [[graft.llm.TextHash]]
  *    (`list_reduce` in DuckDB, `aggregate` in Spark — same fold order);
  *  - every float reduction is a sequential left-to-right fold in Double,
  *    so cosine similarity is bit-identical across engines;
  *  - fractional SQL literals that enter double arithmetic are
  *    `CAST(... AS DOUBLE)` (DuckDB parses bare decimals as DECIMAL);
  *  - arrays are never emitted (element order is engine-dependent); only
  *    order-insensitive reductions of them are.
  */
object LlmQueries {

  private val P = TextHash.Prime

  /** Committed media fixture paths (tools/make_media_fixture.py), resolved
    * against the repo working dir like the GRIB/NetCDF fixtures. */
  // directory + pathGlobFilter, NOT a glob inside the path: a glob path
  // trips the FileStreamSink metadata probe into logging a harmless but
  // scary FileNotFoundException stack trace on every load — a driver that
  // greps stderr for failure patterns would misread it
  private lazy val mediaFixtureDir =
    new java.io.File("data/media").getAbsolutePath
  private lazy val mediaDecodeExpected =
    new java.io.File("data/media/decode_expected.parquet").getAbsolutePath
  private lazy val mediaPixelExpected =
    new java.io.File("data/media/pixel_expected.parquet").getAbsolutePath
  private lazy val mediaResizeExpected =
    new java.io.File("data/media/resize_expected.parquet").getAbsolutePath
  private lazy val mediaPhashExpected =
    new java.io.File("data/media/phash_expected.parquet").getAbsolutePath
  private lazy val mediaAfpExpected =
    new java.io.File("data/media/afp_expected.parquet").getAbsolutePath

  /** Committed WARC crawl fixture (tools/make_warc_fixture.py): the same
    * record stream as record-per-member gzip and as a plain file. */
  private lazy val warcGz =
    new java.io.File("data/warc/crawl.warc.gz").getAbsolutePath
  private lazy val warcPlain =
    new java.io.File("data/warc/crawl.warc").getAbsolutePath
  private lazy val warcRecordsExpected =
    new java.io.File("data/warc/records_expected.parquet").getAbsolutePath
  private lazy val warcTextExpected =
    new java.io.File("data/warc/text_expected.parquet").getAbsolutePath

  /** The committed media fixture as MediaRecords (binaryFile source — the
    * production object-store media-scan shape). */
  private def mediaRecords(s: SparkSession): org.apache.spark.sql.Dataset[MediaRecord] = {
    import s.implicits._
    s.read.format("binaryFile").option("pathGlobFilter", "media_*")
      .load(mediaFixtureDir)
      .select(
        regexp_extract(col("path"), "media_(\\d+)\\.", 1).cast("long").as("doc_id"),
        col("content").as("payload"),
        when(col("path").endsWith(".bmp"), "image/bmp")
          .when(col("path").endsWith(".png"), "image/png")
          .when(col("path").endsWith(".jpg"), "image/jpeg")
          .when(col("path").endsWith(".gif"), "image/gif")
          .when(col("path").endsWith(".wav"), "audio/wav")
          .when(col("path").endsWith(".mp4"), "video/mp4")
          .otherwise("application/octet-stream").as("media_type"))
      .as[MediaRecord]
  }

  // ------------------------------------------------------------ SQL helpers

  /** DuckDB mirror of [[TextHash.polyHash]]. `s` must be a non-empty
    * string expression; `iv` names the lambda variable (vary when nesting). */
  private def polyHashSql(s: String, iv: String = "i"): String =
    s"list_reduce(list_prepend(CAST(${TextHash.Seed} AS BIGINT), " +
      s"list_transform(generate_series(1, len($s)), $iv -> CAST(ascii(substr($s, $iv, 1)) AS BIGINT))), " +
      s"(a, c) -> (a * 31 + c) % $P)"

  /** DuckDB mirror of [[TextHash.charShingles]] (distinct char k-grams). */
  private def shinglesSql(s: String, k: Int): String =
    s"list_distinct(list_transform(generate_series(1, len($s) - ${k - 1}), i -> substr($s, i, $k)))"

  private val tokensSql = """string_split_regex(trim(text), '\s+')"""

  /** DuckDB mirror of [[graft.llm.Similarity.dot]] over double-list
    * expressions `a`, `b` of length `dim`. */
  private def dotSql(a: String, b: String, dim: Int): String =
    s"list_reduce(list_transform(generate_series(1, $dim), i -> $a[i] * $b[i]), (x, y) -> x + y)"

  private def cosineSql(a: String, b: String, dim: Int): String =
    s"(${dotSql(a, b, dim)} / (sqrt(${dotSql(a, a, dim)}) * sqrt(${dotSql(b, b, dim)})))"

  /** The sh/sig/bands CTE prefix shared by [[lshPairsSql]] and the
    * incremental (bipartite) variant: distinct element-hash sets, MinHash
    * signature, band digests. */
  private def lshBandsCte(
      elementsExpr: String,
      perms: Int,
      nBands: Int,
      rowsPerBand: Int,
      source: String): String = {
    val bandFold = (0 until rowsPerBand)
      .map(r => s"sig[$rowsPerBand*b.band+${r + 1}]")
      .mkString("[", ", ", "]")
    s"""WITH sh AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform($elementsExpr, s -> ${polyHashSql("s", "ci")})) AS hs
       |  FROM $source),
       |sig AS (
       |  SELECT doc_id,
       |    list_transform(generate_series(0, ${perms - 1}), j ->
       |      list_min(list_transform(hs, x -> (x * (2*j+1) + (j*j+1)) % $P))) AS sig
       |  FROM sh),
       |bands AS (
       |  SELECT doc_id, b.band,
       |    list_reduce(list_prepend(CAST(${TextHash.Seed} AS BIGINT), $bandFold),
       |      (a, c) -> (a * 31 + c) % $P) AS bh
       |  FROM sig, (SELECT unnest(generate_series(0, ${nBands - 1})) AS band) b)""".stripMargin
  }

  /** DuckDB mirror of the LSH-verified-pairs skeleton in
    * [[graft.llm.Dedup]]: distinct element-hash sets → MinHash signature →
    * band digests → capped bucket groupBy → in-bucket pair expansion →
    * exact Jaccard on the hash sets. `elementsExpr` yields the distinct
    * string elements (shingles or n-grams) of `text`. */
  private def lshPairsSql(
      elementsExpr: String,
      perms: Int,
      nBands: Int,
      rowsPerBand: Int,
      minJaccard: Double,
      maxBucket: Int,
      estSlack: Double = 0.15,
      source: String = "documents"): String = {
    // mirror of Dedup.lshVerifiedPairs' integer screening threshold
    val minAgree = math.ceil((minJaccard - estSlack) * perms).toInt
    s"""${lshBandsCte(elementsExpr, perms, nBands, rowsPerBand, source)},
       |buckets AS (
       |  SELECT band, bh, list(doc_id) AS ids FROM bands GROUP BY 1, 2),
       |pairs AS (
       |  SELECT DISTINCT p[1] AS doc_a, p[2] AS doc_b FROM (
       |    SELECT unnest(flatten(list_transform(ids, x ->
       |      list_transform(list_filter(ids, y -> y > x), y -> [x, y])))) AS p
       |    FROM buckets WHERE len(ids) BETWEEN 2 AND $maxBucket)),
       |screened AS (
       |  SELECT c.doc_a, c.doc_b FROM pairs c
       |  JOIN sig sa ON sa.doc_id = c.doc_a
       |  JOIN sig sb ON sb.doc_id = c.doc_b
       |  WHERE len(list_filter(generate_series(1, $perms), i -> sa.sig[i] = sb.sig[i]))
       |    >= $minAgree)
       |SELECT doc_a, doc_b, jaccard FROM (
       |  SELECT c.doc_a, c.doc_b,
       |    CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
       |      / (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))) AS jaccard
       |  FROM screened c
       |  JOIN sh x ON x.doc_id = c.doc_a
       |  JOIN sh y ON y.doc_id = c.doc_b)
       |WHERE jaccard >= CAST($minJaccard AS DOUBLE)""".stripMargin
  }

  /** Mirror of Retrieval.bm25TopK with logIdf = false: rational idf
    * (N - df + 0.5)/(df + 0.5), tf saturation with k1=1.2 b=0.75,
    * per-term micros rounding, long sum, (score desc, doc_id) top-20.
    * Shared verbatim by q_bm25 and q_bm25_incr — the incremental index
    * build is value-identical to the direct computation. */
  private lazy val bm25OracleSql: String = {
    val terms = Bm25QueryTerms.map("'" + _ + "'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, len($tokensSql) AS dl, unnest($tokensSql) AS token FROM documents),
       |post AS (
       |  SELECT token, doc_id, count(*) AS tf, min(dl) AS dl
       |  FROM toks WHERE token IN ($terms) GROUP BY 1, 2),
       |stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(len($tokensSql)) AS BIGINT) AS total_tokens
       |  FROM documents),
       |dfs AS (SELECT token, count(*) AS df FROM post GROUP BY 1),
       |scored AS (
       |  SELECT p.doc_id,
       |    CAST(round(
       |      ((s.n_docs - d.df + CAST(0.5 AS DOUBLE)) / (d.df + CAST(0.5 AS DOUBLE)))
       |      * ((p.tf * CAST(2.2 AS DOUBLE))
       |         / (p.tf + CAST(1.2 AS DOUBLE)
       |            * (CAST(0.25 AS DOUBLE)
       |               + CAST(0.75 AS DOUBLE) * p.dl
       |                 / (CAST(s.total_tokens AS DOUBLE) / s.n_docs))))
       |      * 1000000) AS BIGINT) AS term_score_micros
       |  FROM post p JOIN dfs d USING (token), stats s),
       |agg AS (
       |  SELECT doc_id, count(*) AS n_matched_terms,
       |    CAST(sum(term_score_micros) AS BIGINT) AS score_micros
       |  FROM scored GROUP BY 1)
       |SELECT doc_id, n_matched_terms, score_micros,
       |  CAST(ROW_NUMBER() OVER (ORDER BY score_micros DESC, doc_id ASC) AS INTEGER) AS rank
       |FROM agg ORDER BY score_micros DESC, doc_id ASC LIMIT 20""".stripMargin
  }

  /** Shared CTE: embeddings as double lists. */
  private val embCte: String =
    "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"

  private def sqDistSql(v: String, c: String): String =
    s"list_reduce(list_transform(generate_series(1, 64), i -> ($v[i] - $c[i]) * ($v[i] - $c[i])), (x, y) -> x + y)"

  private def sqNSql(n: Int, v: String, c: String): String =
    s"list_reduce(list_transform(generate_series(1, $n), i -> ($v[i] - $c[i]) * ($v[i] - $c[i])), (x, y) -> x + y)"

  private def sq32Sql(v: String, c: String): String = sqNSql(32, v, c)

  /** Unrolled PQ trainer mirror of [[graft.llm.Pq.pqTrain]] over source
    * CTE `src` (vec_id, v) — `m` subspaces of `sub` dims, `k` codes,
    * iters=2 = one update round. Yields `${p}sv` (per-vector subspace
    * slices), `${p}final` = (sub, code, dim, c) and `${p}fc` = (sub,
    * code, c as a list). Empty codes keep their seed centroid (the Scala
    * clone-then-overwrite). An m=1 instance is the deterministic
    * full-space Lloyd — the IVF-PQ coarse quantizer. */
  private def pqCte(p: String, src: String, m: Int, sub: Int, k: Int): String =
    s"""${p}subs AS (SELECT unnest(generate_series(0, ${m - 1})) AS sub),
       |${p}seeds AS (SELECT vec_id, v,
       |  CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS code
       |  FROM (SELECT vec_id, v FROM $src WHERE v IS NOT NULL ORDER BY vec_id LIMIT $k)),
       |${p}c0 AS (SELECT s.sub, d.code, d.v[s.sub*$sub+1:(s.sub+1)*$sub] AS c
       |  FROM ${p}subs s, ${p}seeds d),
       |${p}sv AS (SELECT $src.vec_id, s.sub, $src.v[s.sub*$sub+1:(s.sub+1)*$sub] AS sv
       |  FROM $src, ${p}subs s WHERE $src.v IS NOT NULL),
       |${p}d1 AS (SELECT sv.vec_id, sv.sub, c.code, ${sqNSql(sub, "sv.sv", "c.c")} AS dist
       |  FROM ${p}sv sv JOIN ${p}c0 c ON c.sub = sv.sub),
       |${p}a1 AS (SELECT vec_id, sub, code FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
       |    ORDER BY dist ASC, code ASC) AS rn FROM ${p}d1) WHERE rn = 1),
       |${p}u1 AS (SELECT a.sub, a.code, g.j,
       |    CAST(sum(CAST(round(sv.sv[g.j] * 1000000) AS BIGINT)) AS BIGINT) AS s,
       |    count(*) AS n
       |  FROM ${p}a1 a
       |  JOIN ${p}sv sv ON sv.vec_id = a.vec_id AND sv.sub = a.sub,
       |       (SELECT unnest(generate_series(1, $sub)) AS j) g
       |  GROUP BY 1, 2, 3),
       |${p}grid AS (SELECT c.sub, c.code, g.j, c.c[g.j] AS seed_c
       |  FROM ${p}c0 c, (SELECT unnest(generate_series(1, $sub)) AS j) g),
       |${p}final AS (SELECT CAST(grid.sub AS INTEGER) AS sub,
       |    CAST(grid.code AS INTEGER) AS code,
       |    CAST(grid.sub*$sub + grid.j - 1 AS INTEGER) AS dim,
       |    COALESCE(CAST(u.s AS DOUBLE) / (u.n * 1000000), grid.seed_c) AS c
       |  FROM ${p}grid grid LEFT JOIN ${p}u1 u
       |    ON u.sub = grid.sub AND u.code = grid.code AND u.j = grid.j),
       |${p}fc AS (SELECT sub, code, list(c ORDER BY dim) AS c
       |  FROM ${p}final GROUP BY 1, 2)""".stripMargin

  private val pqTrainCte: String = pqCte("pq", "e", 2, 32, 4)

  /** Unrolled farthest-first seed chain (mirrors
    * [[graft.llm.Clustering.farthestFirstSeeds]], generalized from the
    * q_kmeans_pp_seeds oracle): requires CTE `e`, yields `cs0` =
    * (cluster, c) with the k seeds. */
  private def farthestFirstSeedSql(k: Int): String = {
    val steps = (2 to k).map { j =>
      s"""sp$j AS MATERIALIZED (
         |  SELECT e.vec_id, min(${sqDistSql("e.v", "s.c")}) AS dmin
         |  FROM e, s${j - 1} s
         |  WHERE e.vec_id NOT IN (SELECT cluster FROM s${j - 1})
         |  GROUP BY e.vec_id
         |  ORDER BY dmin DESC, e.vec_id ASC LIMIT 1),
         |sn$j AS MATERIALIZED (
         |  SELECT e.vec_id AS cluster, e.v AS c
         |  FROM e, sp$j WHERE e.vec_id = sp$j.vec_id),
         |s$j AS MATERIALIZED (SELECT * FROM s${j - 1} UNION ALL SELECT * FROM sn$j)""".stripMargin
    }.mkString(",\n")
    s"""s1 AS MATERIALIZED (SELECT vec_id AS cluster, v AS c FROM e WHERE v IS NOT NULL ORDER BY vec_id LIMIT 1),
       |$steps,
       |cs0 AS (SELECT cluster, c FROM s$k)""".stripMargin
  }

  /** Guarded unrolled Lloyd chain mirroring
    * [[graft.llm.Clustering.kmeansConverged]]'s
    * `while (moved > eps && i < maxIters)` loop: every round's
    * micros-mean update is adopted, but once a round's total squared
    * centroid movement drops to `eps` the remaining unrolled rounds pass
    * the centroids through untouched — the SQL equivalent of the loop
    * exiting early, which makes the DATA-DEPENDENT loop length exactly
    * expressible as a FIXED `maxIters`-deep CTE chain. Empty clusters
    * keep their previous centroid (COALESCE), as the Scala loop does.
    *
    * All round arithmetic is bit-exact across engines (integer micros
    * sums; sequential-fold distances); the one epsilon-sensitive scalar
    * is the movement sum over k clusters, whose float addition order is
    * engine-dependent — a divergence needs |moved - eps| within ulps,
    * i.e. measure-zero (and movement is EXACTLY 0.0 once assignments
    * stabilize, the common exit).
    *
    * Requires CTEs `e` (corpus) and `cs0` (seed (cluster, c) table);
    * yields `c$rounds` as the final centroid table. */
  private def lloydConvergedSql(rounds: Int, eps: Double): String = {
    val init =
      s"""c0 AS MATERIALIZED (SELECT cluster, c FROM cs0),
         |f0 AS MATERIALIZED (SELECT false AS done)""".stripMargin
    val steps = (1 to rounds).map { j =>
      val p = j - 1
      s"""d$j AS MATERIALIZED (
         |  SELECT e.vec_id, e.v, c.cluster, ${sqDistSql("e.v", "c.c")} AS dist FROM e, c$p c),
         |a$j AS MATERIALIZED (
         |  SELECT vec_id, v, cluster FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY dist ASC, cluster ASC) AS rn
         |    FROM d$j) WHERE rn = 1),
         |u$j AS MATERIALIZED (
         |  SELECT cluster, g.dim,
         |    CAST(sum(CAST(round(v[g.dim] * 1000000) AS BIGINT)) AS BIGINT) AS s,
         |    count(*) AS n
         |  FROM a$j, (SELECT unnest(generate_series(1, 64)) AS dim) g
         |  GROUP BY 1, 2),
         |n$j AS MATERIALIZED (
         |  SELECT cluster, list(CAST(s AS DOUBLE) / (n * 1000000) ORDER BY dim) AS c
         |  FROM u$j GROUP BY 1),
         |c$j AS MATERIALIZED (
         |  SELECT p.cluster,
         |    CASE WHEN f.done THEN p.c ELSE COALESCE(n.c, p.c) END AS c
         |  FROM c$p p LEFT JOIN n$j n USING (cluster) CROSS JOIN f$p f),
         |f$j AS MATERIALIZED (
         |  SELECT f.done OR (
         |    SELECT sum(${sqDistSql("p.c", "q.c")})
         |    FROM c$p p JOIN c$j q USING (cluster)
         |  ) <= CAST($eps AS DOUBLE) AS done FROM f$p f)""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }

  /** DuckDB mirror of [[graft.llm.Similarity.hyperplaneBucket]] over the
    * double-list column `v` (dim 64). */
  private def bucketSql(nPlanes: Int): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(0, ${nPlanes - 1}), j ->
       |      CASE WHEN list_reduce(list_transform(generate_series(1, 64),
       |          i -> v[i] * CAST(((j * 1000003 + i * 7919) % 2001) - 1000 AS DOUBLE)),
       |          (x, y) -> x + y) >= 0
       |        THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)),
       |      (x, y) -> x + y)""".stripMargin

  /** BM25 demo query: one marker term per language family, so the scored
    * doc set spans the corpus (vocabulary = the 31 LangMarkers words). */
  private val Bm25QueryTerms = Seq("table", "stream", "hash", "vector")

  // ------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: hash-groupBy with in-group text equality
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exact(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),

    // MinHash + banded LSH near-dup pairs, exact-Jaccard verified
    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashPairs(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        shingleK = 5, perms = 64, nBands = 16, rowsPerBand = 4, minJaccard = 0.5)),

    // near-dup clusters: connected components over the MinHash pairs
    "q_dedup_clusters" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      Dedup.clusters(
        docs.select(col("doc_id")),
        Dedup.minhashPairs(docs, "doc_id", "text", minJaccard = 0.5))
    }),

    // quality-argmax representative per near-dup cluster (keep the best
    // copy, not the lowest id)
    "q_cluster_rep" -> ((s, dir) =>
      Dedup.clusterRepresentatives(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),

    // SimHash fingerprints (per-doc 24-bit)
    "q_simhash_fingerprint" -> ((s, dir) =>
      Dedup.simhashFingerprints(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),

    // SimHash banded near-dup pairs, exact-hamming verified
    "q_dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        bits = 24, bandBits = 6, maxHamming = 2)),

    // incremental MinHash near-dup: new batch (doc_id >= 250) vs history,
    // bipartite band join — history is never pair-expanded against itself
    "q_minhash_incr" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Dedup.minhashIncrementalPairs(
        d.filter(col("doc_id") >= 250), d.filter(col("doc_id") < 250), "doc_id", "text",
        shingleK = 5, perms = 64, nBands = 16, rowsPerBand = 4, minJaccard = 0.5)
    }),

    // cross-document duplicated-span signal (span-granular dedup aggregate)
    "q_dup_spans" -> ((s, dir) =>
      Dedup.dupSpans(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", n = 5)),

    // duplicated-span REMOVAL: text rebuilt with shared spans excised
    "q_dup_remove" -> ((s, dir) =>
      Dedup.removeDupSpans(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", n = 5)),

    // word-3-gram Jaccard near-dup pairs via inverted-index join
    "q_dedup_ngram" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        n = 3, minJaccard = 0.5)),

    // embedding near-dup pairs: hyperplane-LSH bucket join + exact cosine
    "q_dedup_embedding" -> ((s, dir) =>
      Similarity.nearDupPairs(s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        dim = 64, nPlanes = 6, minCosine = 0.3)),

    // exact cosine top-k for 8 query vectors (broadcast NL join)
    "q_ann_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        queryIds = 0L until 8L, k = 10)),

    // approximate top-k restricted to the query's LSH bucket (scale path)
    "q_ann_lsh" -> ((s, dir) =>
      Similarity.lshTopK(s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        queryIds = 0L until 8L, k = 10, nPlanes = 4)),

    // multiprobe variant: also search hamming-1 buckets (recall dial)
    "q_ann_multiprobe" -> ((s, dir) =>
      Similarity.lshTopK(s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        queryIds = 0L until 8L, k = 10, nPlanes = 4, multiprobe = 2)),

    // symmetric int8 embedding quantization (vector-serving compression)
    "q_embed_quantize" -> ((s, dir) =>
      Similarity.quantizeInt8(s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")),

    // IVF variant: nearest-centroid cells, nProbes cells searched per query
    "q_ann_ivf" -> ((s, dir) =>
      Similarity.ivfTopK(s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        queryIds = 0L until 8L, k = 10, nCentroids = 16, nProbes = 4)),

    // incremental IVF maintenance: a persisted quantizer (the q_ann_ivf
    // cells, trained on the historical half) assigns a NEW embedding drop
    // in one map-only kernel pass — the appendable posting rows
    "q_ann_ivf_append" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.ivfAssign(
        emb.filter(col("vec_id") >= 250), "vec_id", "embedding",
        emb.filter(col("vec_id") < 16)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("vc")))
    }),

    // the PRODUCTION IVF path: coarse quantizer = k-means centroids (a few
    // refinement rounds suffice for a quantizer), then the same
    // bucket-join search. Exact-hash oracle: the data-dependent training
    // loop is a GUARDED unrolled CTE chain (lloydConvergedSql) feeding
    // the q_ann_ivf search SQL.
    "q_ann_ivf_trained" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      // first-k seeding: farthest-first's k-1 sequential rounds buy seed
      // spread a 3-round Lloyd refinement of a COARSE quantizer doesn't
      // need — the cells move to the data either way
      val (corpus, centroids) = Clustering
        .kmeansConvergedModel(emb, "vec_id", "embedding", k = 16,
          eps = 1e-6, maxIters = 3, farthestFirst = false)
      // search over the training loop's checkpointed corpus — one scan
      // and one float→double conversion for both train and search
      Similarity.ivfTopKWith(corpus, "vec_id", "v",
        centroids.select(col("cluster").as("centroid_id"), col("c").as("vc")),
        queryIds = 0L until 8L, k = 10, nProbes = 4)
    }),

    // winnowing fingerprints (position-robust local-sampling sketch)
    "q_winnow" -> ((s, dir) =>
      TextAnalysis.winnow(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),

    // two-phase salted aggregation (hot-key spreading, decomposable aggs)
    "q_salted_agg" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/events.parquet")
      graft.scale.Skew.saltedAggs(
        e.select(col("event_type"), col("user_id"), col("value")),
        Seq("event_type"),
        saltFactor = 8,
        aggs = Seq(
          count(lit(1)).as("pc") -> sum(col("pc")).as("n_events"),
          sum(round(col("value") * 1e6).cast("long")).as("ps") ->
            sum(col("ps")).as("value_micros"),
          min(col("value")).as("pmin") -> min(col("pmin")).as("value_min"),
          max(col("value")).as("pmax") -> max(col("pmax")).as("value_max")))
    }),

    // incremental dedup: new batch (doc_id >= 250) vs historical corpus
    "q_dedup_incremental" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Dedup.incremental(
        d.filter(col("doc_id") >= 250), "doc_id", "text",
        d.filter(col("doc_id") < 250).select(md5(col("text")).as("text_md5")))
    }),

    // overlapping context-window chunking (64-token chunks, 16 overlap)
    "q_chunk" -> ((s, dir) =>
      TextAnalysis.chunk(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),

    // Gopher-style repetition signals (per-row kernel, no shuffle)
    "q_repetition" -> ((s, dir) =>
      TextAnalysis.repetition(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),

    // corpus mixture report: per-(source, lang) counts and shares
    "q_mixture" -> ((s, dir) =>
      Mixture.report(s.read.parquet(s"$dir/documents.parquet"), Seq("source", "lang"), "n_chars")),

    // one-row corpus health report (integer aggregates only)
    "q_corpus_report" -> ((s, dir) =>
      Mixture.corpusReport(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", "n_chars")),

    // deterministic per-source quota sampling (top-N by hash rank)
    "q_stratified_sample" -> ((s, dir) =>
      Mixture.stratifiedSample(
        s.read.parquet(s"$dir/documents.parquet").select("doc_id", "source"),
        "doc_id", "source", perStratum = 10)),

    // token-budget mixture sampling: per-source hash-priority draws until
    // the budget is exhausted (running-sum cut, deterministic)
    "q_budget_sample" -> ((s, dir) =>
      Mixture.budgetSample(
        s.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "source", "n_chars", budget = 3000L)),

    // KMV distinct-count sketch: per-lang distinct-token estimates — the
    // k-minimum-values bottom-k is a pure function of the value set, so
    // even the ESTIMATE path is bit-deterministic and exactly mirrored
    "q_distinct_kmv" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("lang"), explode(TextHash.wordTokens(col("text"))).as("token"))
        .groupBy("lang")
        .agg(graft.functions.KmvDistinct(col("token"), 64).as("d"))
        .select(col("lang"), col("d.n_distinct").as("n_distinct"),
          col("d.is_exact").as("is_exact"))),

    // one-pass table profile: per-column completeness/cardinality/range
    // report (all columns in a single scan of mergeable aggregates)
    "q_profile" -> ((s, dir) =>
      Profile.profile(s.read.parquet(s"$dir/documents.parquet"))),

    // Heaps'-law vocabulary-growth curve: distinct tokens seen after each
    // eighth of the global token stream (doc_id order, prefix-sum global
    // positions) — the tokenizer-vocab sizing signal
    "q_vocab_growth" -> ((s, dir) =>
      TextAnalysis.vocabGrowth(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),

    // taxonomy/domain tagging: per-topic keyword-occurrence counts in one
    // Aho-Corasick scan; the "fragments" topic deliberately uses short
    // substrings ("a", "or", "ta") so overlapping all-start-position
    // counting inside longer tokens is exercised, not just token hits
    "q_tag_taxonomy" -> ((s, dir) =>
      TextAnalysis.tagTaxonomy(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        taxonomyV)),

    // incremental profile: the corpus arrives as two "drops" (even/odd
    // doc_id, NULL ids routed to the first so the union is exact), each
    // profiled ONCE into a mergeable state table; the merge must equal
    // the one-pass profile of everything to the bit (shared oracle)
    "q_profile_incr" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val even = coalesce(pmod(col("doc_id"), lit(2)) === 0, lit(true))
      Profile.merge(Seq(
        Profile.state(d.filter(even)),
        Profile.state(d.filter(!even))))
    }),

    // JSON metadata extraction from the events props column
    "q_json_extract" -> ((s, dir) =>
      Events.extractProps(s.read.parquet(s"$dir/events.parquet"))),

    // shard assignment + within-shard packing offsets (char budget)
    "q_pack_shards" -> ((s, dir) =>
      Packing.assignShards(
        s.read.parquet(s"$dir/documents.parquet").select("doc_id", "n_chars"),
        "doc_id", "n_chars", nShards = 16)),

    // deterministic train/val/test split assignment (hash-bucket, no RNG)
    "q_sample_split" -> ((s, dir) =>
      Sampling.split(s.read.parquet(s"$dir/documents.parquet"), "doc_id")),

    // PII-pattern flags (emails / phones / IPv4)
    "q_pii" -> ((s, dir) =>
      TextAnalysis.piiFlags(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),

    // benchmark decontamination: word-3-gram overlap vs doc_id < 50
    "q_decontaminate" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Contamination.overlap(d, d.filter(col("doc_id") < 50), "doc_id", "text")
    }),

    // contaminated-span removal: the overlap test's APPLY side — tokens
    // covered by benchmark 3-grams are cut out, the doc is salvaged
    "q_decontam_remove" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Contamination.removeOverlap(d, d.filter(col("doc_id") < 50), "doc_id", "text")
    }),

    // corpus-level 3-gram Jaccard between the two corpus halves via KMV
    // sketches — one pass per side, integer-ppm estimate, exact below
    // sketch capacity
    "q_corpus_overlap" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Contamination.corpusOverlap(
        d.filter(col("doc_id") < 250), d.filter(col("doc_id") >= 250), "text")
    }),

    // embedding-space decontamination: bipartite LSH bucket join of the
    // corpus against a broadcast eval set (vec_id < 50), exact-cosine
    // per-document verdict — catches paraphrased leakage n-grams miss
    "q_decontam_semantic" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      Contamination.semantic(
        e.filter(col("vec_id") >= 50), e.filter(col("vec_id") < 50),
        "vec_id", "embedding", nPlanes = 4, minCosine = 0.8, multiprobe = 1)
    }),

    // corpus vocabulary: token tf/df, top 100 (tokenizer-training input)
    // BM25 ranked retrieval: query-term postings + broadcast stats, top-20
    "q_bm25" -> ((s, dir) =>
      Retrieval.bm25TopK(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        Bm25QueryTerms, k = 20, logIdf = false)),

    // incremental BM25: the index is built drop-by-drop (postings +
    // mergeable stats rows appended per half, no re-tokenization) and
    // searched over the union — must rank identically to q_bm25
    "q_bm25_incr" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val drops = Seq(d.filter(col("doc_id") < 250), d.filter(col("doc_id") >= 250))
      Retrieval.bm25OverIndex(
        drops.map(Retrieval.invertedIndex(_, "doc_id", "text")).reduce(_ unionByName _),
        drops.map(Retrieval.corpusStats(_, "doc_id", "text")).reduce(_ unionByName _),
        Bm25QueryTerms, k = 20, logIdf = false)
    }),

    // TF-IDF weights over the full (doc, term) postings table
    "q_tfidf" -> ((s, dir) =>
      Retrieval.tfidf(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        logIdf = false)),

    // Lloyd's k-means, 2 deterministic rounds from the vec_id < k seeds
    "q_kmeans" -> ((s, dir) =>
      Clustering.kmeans(s.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", k = 8, iters = 2)),

    // deterministic farthest-first (k-means++-style) seed selection
    "q_kmeans_pp_seeds" -> ((s, dir) =>
      Clustering.farthestFirstSeeds(s.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", k = 4)
        .select("cluster", "dmin_micros")),

    // the PRODUCTION k-means path: farthest-first seeds + movement-eps
    // convergence loop. Exact-hash oracle: the data-dependent loop length
    // is expressible after all — a guarded unrolled CTE chain whose
    // rounds become pass-throughs once movement drops to eps
    // (lloydConvergedSql), maxIters deep.
    "q_kmeans_converged" -> ((s, dir) =>
      Clustering.kmeansConverged(s.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", k = 8, eps = 1e-6, maxIters = 10)),

    // ROLLUP mixture accounting: every granularity in one aggregation
    "q_mixture_rollup" -> ((s, dir) =>
      Mixture.rollupReport(s.read.parquet(s"$dir/documents.parquet"),
        Seq("source", "lang"), "n_chars")),

    // cross-tab: doc counts per source x lang (explicit pivot values)
    "q_pivot" -> ((s, dir) =>
      Mixture.pivotCounts(s.read.parquet(s"$dir/documents.parquet"), "source", "lang",
        Seq("de", "en", "es", "fr", "zh"))),

    // per-user lag/lead + trailing ROWS-frame moving sum
    "q_moving_avg" -> ((s, dir) =>
      Events.movingStats(s.read.parquet(s"$dir/events.parquet"), window = 4)),

    // rank / percent_rank / cume_dist / ntile per event type
    "q_rank_stats" -> ((s, dir) =>
      Events.rankStats(s.read.parquet(s"$dir/events.parquet"), nTiles = 4)),

    // fixed-range equi-width histogram per event type
    "q_histogram" -> ((s, dir) =>
      Events.histogram(s.read.parquet(s"$dir/events.parquet"),
        lo = 0.0, hi = 500.0, nBuckets = 20)),

    // cross-document sequence packing spans (two-phase global prefix sum)
    "q_seq_pack" -> ((s, dir) =>
      Packing.sequenceSpans(s.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text", seqLen = 128)),

    // latest-wins snapshot merge: upserts + inserts + tombstones
    "q_scd_merge" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val cur = d.withColumn("version", lit(1L)).withColumn("deleted", lit(false))
      val upserts = d.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"),
          col("lang"), col("source"), (col("n_chars") + 3).as("n_chars"),
          lit(2L).as("version"), (pmod(col("doc_id"), lit(3)) === 0).as("deleted"))
      val inserts = d.filter(pmod(col("doc_id"), lit(11)) === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars"),
          lit(2L).as("version"), lit(false).as("deleted"))
      graft.operators.SnapshotMerge.merge(
        cur, upserts.unionByName(inserts), "doc_id", "version", Some("deleted"))
    }),

    // snapshot-version audit diff: old = docs without the 7-multiples,
    // new = docs without the 11-multiples with 5-multiples' text edited
    // -> added/removed/changed/unchanged per key
    "q_snapshot_diff" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val oldSnap = d.filter(pmod(col("doc_id"), lit(7)) =!= 0)
        .select(col("doc_id"), col("text"), col("lang"))
      val newSnap = d.filter(pmod(col("doc_id"), lit(11)) =!= 0)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(5)) === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"),
          col("lang"))
      graft.operators.SnapshotMerge.snapshotDiff(
        oldSnap, newSnap, "doc_id", Seq("text", "lang"))
    }),

    // bloom-prefiltered exact semi-join: events of high-value purchasers
    "q_bloom_join" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/events.parquet")
      val buyers = e.filter(col("event_type") === "purchase" && col("value") > 90)
        .select("user_id")
      graft.scale.Bloom.semiJoin(
        e.select(col("event_id"), col("user_id"), col("event_type")),
        buyers, "user_id")
    }),

    // Tukey-fence outliers per event type (exact quartiles, oracle mode)
    "q_outliers" -> ((s, dir) =>
      Events.outliers(s.read.parquet(s"$dir/events.parquet"), factor = 1.5, exact = true)),

    "q_vocabulary" -> ((s, dir) =>
      TextAnalysis.vocabulary(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),

    // adjacent-pair frequencies: the BPE merge-candidate table
    "q_pair_vocabulary" -> ((s, dir) =>
      TextAnalysis.pairVocabulary(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),

    // data-driven stopword discovery by document-frequency ratio
    "q_stopwords" -> ((s, dir) =>
      TextAnalysis.stopwordCandidates(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),

    // per-document text statistics
    "q_text_stats" -> ((s, dir) =>
      TextAnalysis.stats(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),

    // n-gram-heuristic language ID
    "q_lang_id" -> ((s, dir) =>
      TextAnalysis.langId(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),

    // language-ID confusion matrix vs the labeled lang column: the label
    // rides through langId as a pass-through column, so this is one scan +
    // one groupBy — no self-join back to the corpus
    "q_lang_confusion" -> ((s, dir) =>
      TextAnalysis.langId(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
          passThrough = Seq("lang"))
        .groupBy("lang", "predicted_lang")
        .agg(count(lit(1)).as("n_docs"))),

    // composite quality score + bucket
    "q_quality_score" -> ((s, dir) =>
      TextAnalysis.qualityScore(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),

    // end-to-end curation: quality gate -> near-dup clusters -> keep/drop
    "q_curate" -> ((s, dir) =>
      Curation.curate(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),

    // content fingerprints (full-text hash + min/max 8-gram rolling hash)
    "q_text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),

    // binary-payload metadata (multimodal column plumbing)
    "q_multimodal_meta" -> ((s, dir) =>
      Multimodal.metadata(
        Multimodal.payloadsFromText(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text"))),

    // strided binary frame sampling (frames compared as hex: the oracle
    // cannot slice blobs, and hex equality is byte equality)
    "q_multimodal_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(
        Multimodal.payloadsFromText(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text"))
        .select(col("doc_id"), col("frame_idx"),
          upper(hex(col("frame"))).as("frame_hex"))),

    // bounded-box resize plan over decoded (stub) dimensions
    "q_multimodal_resize" -> ((s, dir) => {
      import s.implicits._
      Multimodal.resize(
        Multimodal.payloadsFromText(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
          .as[MediaRecord])
    }),

    // REAL header decode over committed spec-written media files (BMP /
    // PNG / RIFF-WAVE + one opaque blob exercising the stub fallback);
    // oracle = the fixture generator's independently-computed expectation
    // (tools/make_media_fixture.py). binaryFile source -> per-partition
    // decode, the production object-store media-scan shape.
    "q_multimodal_decode" -> ((s, _) => {
      import s.implicits._
      Multimodal.decodeMedia(mediaRecords(s)).toDF()
    }),

    // FULL pixel/sample decode: BMP pixel rows, PNG inflate+defilter (JDK
    // zlib), WAV PCM samples — stats over the actually-decoded arrays,
    // oracle = the generator's independently-computed pixel ground truth
    "q_media_pixels" -> ((s, _) => {
      import s.implicits._
      Multimodal.pixelStats(mediaRecords(s)).toDF()
    }),

    // perceptual image hashes (aHash/dHash) over the really-decoded
    // pixels — the image-side near-dup feature, fully integer
    "q_media_phash" -> ((s, _) => {
      import s.implicits._
      Multimodal.pHash(mediaRecords(s)).toDF()
    }),

    // perceptual near-dup image pairs: aHash byte-band blocking + exact
    // combined hamming over the decoded fixture (incl. the planted
    // byte-different duplicate of media_001)
    "q_media_neardup" -> ((s, _) => {
      import s.implicits._
      Multimodal.pHashPairs(Multimodal.pHash(mediaRecords(s)).toDF())
    }),

    // energy-envelope audio fingerprints over the decoded PCM — the
    // audio-side near-dup feature (envelope delta signs, 65 windows)
    "q_media_afp" -> ((s, _) => {
      import s.implicits._
      Multimodal.audioFingerprint(mediaRecords(s)).toDF()
    }),

    // audio near-dup pairs: envelope-fingerprint byte-band blocking over
    // the fixture (incl. the planted nudged-PCM duplicate of media_008)
    "q_media_afp_pairs" -> ((s, _) => {
      import s.implicits._
      Multimodal.afpPairs(
        Multimodal.audioFingerprint(mediaRecords(s)).toDF()
          .select("doc_id", "afp"))
    }),

    // REAL nearest-neighbor resample of the decodable fixture images
    "q_media_resize" -> ((s, _) => {
      import s.implicits._
      Multimodal.resizePixels(mediaRecords(s)).toDF()
    }),

    // tumbling-window event aggregation
    "q_events_window" -> ((s, dir) =>
      Events.windowedCounts(s.read.parquet(s"$dir/events.parquet"))),

    // gap-based sessionization
    "q_sessionize" -> ((s, dir) =>
      Events.sessionize(s.read.parquet(s"$dir/events.parquet"))),

    // strictly-ordered view -> click -> purchase funnel per user
    "q_funnel" -> ((s, dir) =>
      Events.funnel(s.read.parquet(s"$dir/events.parquet"))),

    // weekly cohort retention grid
    "q_retention" -> ((s, dir) =>
      Events.retention(s.read.parquet(s"$dir/events.parquet"))),

    // hopping-window aggregation (1h windows sliding every 30min)
    "q_events_hopping" -> ((s, dir) =>
      Events.hoppingCounts(s.read.parquet(s"$dir/events.parquet"))),

    // range join: events landing inside 2h windows opened by trigger events
    "q_range_join" -> ((s, dir) => {
      val raw = s.read.parquet(s"$dir/events.parquet")
      val ev = raw.select(col("event_id"), col("user_id"), Events.tsMicros(raw).as("ts_us"))
      val iv = ev.filter(col("event_id") % 101 === 0)
        .select(col("user_id"), col("event_id").as("interval_id"),
          col("ts_us").as("start_us"), (col("ts_us") + 7200000000L).as("end_us"))
      graft.operators.RangeJoin.pointInInterval(
        ev, iv, Seq("user_id"), "ts_us", "start_us", "end_us", bucketWidth = 3600000000L)
        .select("event_id", "user_id", "ts_us", "interval_id", "start_us", "end_us")
    }),

    // as-of join: each event gets its user's latest preceding rate update
    "q_asof_join" -> ((s, dir) => {
      val raw = s.read.parquet(s"$dir/events.parquet")
      val ev = raw.select(
        col("event_id"), col("user_id"), Events.tsMicros(raw).as("ts_us"), col("value"))
      val rates = ev.filter(col("event_id") % 97 === 0)
        .groupBy("user_id", "ts_us").agg(max("value").as("rate"))
      graft.operators.AsofJoin(ev, rates, Seq("user_id"), "ts_us", "rate")
    }),

    // trained naive-Bayes token-likelihood model (dense label×vocab grid,
    // add-one smoothing, micro-log quantization)
    "q_nb_train" -> ((s, dir) =>
      Classify.nbTrain(s.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text", "lang")),

    // self-train-and-score naive-Bayes classification: integer score sums
    // against the trained model, argmax (score desc, label asc); the true
    // label rides through for downstream confusion
    "q_nb_classify" -> ((s, dir) =>
      Classify.nbClassify(s.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text", "lang", passThrough = Seq("lang"))),

    // SemDeDup: k-means cells bound the pairwise-cosine near-dup search;
    // drop a doc when a smaller-id cell-mate's cosine >= tau
    "q_semantic_dedup" -> ((s, dir) =>
      Dedup.semantic(s.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", k = 8, iters = 2, tau = 0.3)),

    // k-means over feature-HASHED text vectors: raw documents into the
    // vector stack with no vocabulary pass (HashingTF shape, dim=16)
    "q_kmeans_text" -> ((s, dir) =>
      Clustering.kmeans(
        TextAnalysis.hashedFeatures(
          s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", dim = 16),
        "vec_id", "features", k = 4, iters = 2)),

    // the complete five-gate curation recipe: exact dup -> quality ->
    // trained classifier -> LM floor -> near-dup representative
    "q_curate_v2" -> ((s, dir) =>
      Curation.curateV2(s.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text", "lang", acceptLabels = Set("en", "de", "fr"))),

    // the SEVEN-gate verdict: v2's five gates plus per-domain admission
    // (the q_domain_cap URL grid) and benchmark decontamination
    "q_curate_v3" -> ((s, dir) => {
      val d0 = s.read.parquet(s"$dir/documents.parquet")
      Curation.curateV3(
        d0.withColumn("url", expr(urlConstructSql("STRING"))),
        "doc_id", "text", "lang", "url",
        benchmark = d0.filter(col("doc_id") < 50),
        acceptLabels = Set("en", "de", "fr"), perDomain = 3)
    }),

    // product-quantization codebook: per-subspace deterministic Lloyd
    // (fused one-pass-per-round trainer), emitted as (sub, code, dim, c)
    "q_pq_train" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      Pq.modelDf(s, Pq.pqTrain(e, "vec_id", "embedding", dim = 64, m = 2, k = 4))
    }),

    // asymmetric-distance (ADC) top-10 against the trained codebook:
    // integer micros table sums, zero-shuffle scoring
    "q_pq_search" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val model = Pq.pqTrain(e, "vec_id", "embedding", dim = 64, m = 2, k = 4)
      val q = e.orderBy(col("vec_id")).limit(1)
        .select(Similarity.asDouble(col("embedding"))).head.getSeq[Double](0).toArray
      Pq.pqTopKWith(e, "vec_id", "embedding", model, q, k = 10)
    }),

    // the full two-stage IVF-PQ index (coarse quantizer + residual
    // product codes), probed at 2 of 4 cells — every stage (coarse
    // Lloyd, residual PQ, encode, probe order, per-cell ADC) exactly
    // mirrored by the composed oracle
    "q_ann_ivfpq" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val (coarse, pq) = Pq.ivfPqTrain(e, "vec_id", "embedding",
        dim = 64, cells = 4, m = 2, k = 4)
      val q = e.orderBy(col("vec_id")).limit(1)
        .select(Similarity.asDouble(col("embedding"))).head.getSeq[Double](0).toArray
      Pq.ivfPqSearch(e, "vec_id", "embedding", coarse, pq, q,
        nProbes = 2, topK = 10)
    }),

    // batch retrieval over the persisted code index: ONE index scan
    // answers the whole query set (the serving shape — per-query ADC
    // tables broadcast as a probe frame, scoring is a joined-column fold)
    "q_ann_ivfpq_batch" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val (coarse, pq) = Pq.ivfPqTrain(e, "vec_id", "embedding",
        dim = 64, cells = 4, m = 2, k = 4)
      Pq.ivfPqSearchBatchOverIndex(
        Pq.ivfPqEncode(e, "vec_id", "embedding", coarse, pq),
        coarse, pq, e.filter(col("vec_id") < 4), "vec_id", "embedding",
        nProbes = 2, topK = 10)
    }),

    // IVF-PQ + float RE-RANK (the production retrieval-quality shape the
    // C1 recall measurement motivates): the no-floats index serves 10
    // ADC candidates per query, only those fetch their float vectors
    // (broadcast candidate frame -> one semi-joined scan), exact
    // micros-quantized squared-L2 re-ranks to the final top-5
    "q_ann_ivfpq_rerank" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val (coarse, pq) = Pq.ivfPqTrain(e, "vec_id", "embedding",
        dim = 64, cells = 4, m = 2, k = 4)
      Pq.ivfPqSearchRerankBatch(
        Pq.ivfPqEncode(e, "vec_id", "embedding", coarse, pq),
        coarse, pq, e, "vec_id", "embedding", e.filter(col("vec_id") < 4),
        nProbes = 2, candidates = 10, topK = 5)
    }),

    // ADAPTIVE probing: cells ranked by query-centroid distance, probed
    // until the cumulative cell occupancy reaches the candidate budget
    // (capped at maxProbes) — per-query scan cost bounded by the budget,
    // not worst-case probes x max cell; the probe-set rule (exclusive
    // cumulative count) is mirrored exactly in the DuckDB oracle
    "q_ann_adaptive" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val (coarse, pq) = Pq.ivfPqTrain(e, "vec_id", "embedding",
        dim = 64, cells = 4, m = 2, k = 4)
      Pq.ivfPqSearchAdaptiveBatch(
        Pq.ivfPqEncode(e, "vec_id", "embedding", coarse, pq),
        coarse, pq, e.filter(col("vec_id") < 4), "vec_id", "embedding",
        candidateBudget = 150, maxProbes = 3, topK = 10)
    }),

    // PCA over the embedding corpus: one exact-decimal moment pass ->
    // driver Jacobi -> (comp, dim, loading, eigval) model (+ mean rows)
    "q_pca_train" -> ((s, dir) =>
      Pca.pcaModel(s.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", dim = 64, k = 8)),

    // INCREMENTAL PCA: per-drop mergeable moment states (exact decimal
    // sums + a count row) folded into the bit-identical model — "PCA of
    // everything so far" at O(drops) dimension-sized work. Shares
    // q_pca_train's invariant oracle VERBATIM.
    "q_pca_incr" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val drops = (0 until 3).map(i =>
        Pca.state(e.filter(pmod(col("vec_id"), lit(3)) === i), "embedding", dim = 64))
      Pca.pcaModelFromStates(drops, dim = 64, k = 8)
    }),

    // projection onto the trained basis: zero-shuffle literal-fold
    "q_pca_project" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      Pca.pcaProject(e, "vec_id", "embedding",
        Pca.pcaModel(e, "vec_id", "embedding", dim = 64, k = 8))
    }),

    // PCA-whitened projections: per-component 1/sqrt(eigval) scaling
    "q_pca_whiten" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      Pca.pcaWhiten(e, "vec_id", "embedding",
        Pca.pcaModel(e, "vec_id", "embedding", dim = 64, k = 8))
    }),

    // PMI collocation mining: adjacent-pair pointwise mutual information
    // over the capped vocab (the word2phrase phrase-detection pass)
    "q_collocations" -> ((s, dir) =>
      Collocations.pmi(s.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text")),

    // phrase application: greedy left-to-right merge of the positively-
    // associated PMI pairs into joined tokens (word2phrase second half)
    "q_phrase_merge" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val phrases = Collocations.pmi(d, "doc_id", "text")
        .filter(col("pmi_micros") > 0)
        .select("t1", "t2").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      Collocations.mergePhrases(d, "doc_id", "text", phrases)
    }),

    // trainable bigram LM: sparse add-one-smoothed bigram table over the
    // capped vocab (the CCNet/KenLM-style distributional quality model)
    "q_lm_train" -> ((s, dir) =>
      LangModel.lmBigrams(s.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text")),

    // per-doc summed bigram log-prob: zero-shuffle fold over the two
    // collected model maps, integer micros sums
    "q_lm_score" -> ((s, dir) =>
      LangModel.lmScore(s.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text")),

    // CCNet head/middle/tail perplexity terciles per language:
    // broadcast per-lang cutoffs over the unshuffled scored scan (no
    // per-lang ntile window), integer-micros comparisons throughout
    "q_ccnet_buckets" -> ((s, dir) =>
      LangModel.ccnetBuckets(s.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text", "lang")),

    // trainable BPE: 8 merges from the word histogram (driver-side merge
    // loop over ONE corpus pass), emitted as the ranked merge table
    "q_bpe_train" -> ((s, dir) =>
      Bpe.trainDf(s.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text", merges = 8, maxWords = 1000)),

    // BPE encode with the trained merges: compiled kernel projection;
    // per-doc token count + order-sensitive token-sequence hash
    "q_bpe_encode" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Bpe.encode(d, "doc_id", "text",
        Bpe.train(d, "doc_id", "text", merges = 8, maxWords = 1000))
    }),

    // SpaceSaving heavy hitters over the corpus token stream: mergeable
    // <=1024-counter sketches, top-16 by (est desc, token asc). EXACT
    // (err=0) here because per-buffer distinct counts fit the capacity —
    // the eviction/truncation sketch path is property-pinned in
    // TopKFreqSpec, the exactness precondition by the oracle itself
    "q_heavy_hitters" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(explode(TextHash.wordTokens(col("text"))).as("token"))
        .agg(graft.functions.TopKFreq(col("token"), 16, 1024).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.item").as("token"), col("h.est").as("est"),
          col("h.err").as("err"))),

    // ------------------------------------------------------ WARC ingestion

    // WARC (ISO 28500) crawl scan: every record's metadata + payload
    // digest. Fixture = independent python implementation of the WARC 1.1
    // + RFC 9112 specs (tools/make_warc_fixture.py); covers record-per-
    // member gzip, LWS header folding, chunked transfer coding with
    // extensions + trailers, and gzip + deflate (zlib AND raw) content
    // codings. payload is the DECODED http body for responses (raw block
    // otherwise); unsupported codings (br) reject loudly.
    "q_warc_records" -> ((s, _) => s.read
      .format(classOf[graft.sources.WarcSource].getName)
      .option("path", warcGz)
      .load()
      .select(col("record_idx"), col("offset"), col("record_type"),
        col("record_id"), col("target_uri"), col("warc_date"),
        col("content_type"), col("content_length"), col("http_status"),
        col("http_content_type"), col("payload_len"),
        md5(col("payload")).as("payload_md5"))),

    // the production filter shape: record_type + http_status equality is
    // PUSHED into the record loop (WarcSourceSpec asserts the plan and
    // the skip behavior); reads the uncompressed twin so both layouts pin
    "q_warc_responses" -> ((s, _) => s.read
      .format(classOf[graft.sources.WarcSource].getName)
      .option("path", warcPlain)
      .load()
      .filter(col("record_type") === "response" && col("http_status") === 200)
      .select(col("record_idx"), col("target_uri"), col("http_content_type"),
        col("payload_len"), md5(col("payload")).as("payload_md5"))),

    // crawl → text: GRAFT-HTML-TEXT v1 extraction (compiled kernel) over
    // the decoded HTML payloads; the expectation is computed by python's
    // STDLIB html.parser — an independent HTML tokenizer
    "q_warc_text" -> ((s, _) => s.read
      .format(classOf[graft.sources.WarcSource].getName)
      .option("path", warcGz)
      .load()
      .filter(col("record_type") === "response" && col("http_status") === 200 &&
        col("http_content_type").startsWith("text/html"))
      .select(col("record_idx"), col("target_uri"),
        graft.functions.GraftHtmlOps.htmlTextCol(col("payload").cast("string"))
          .as("text"))),

    // WebDataset egress round trip: documents → from-spec ustar tar
    // shards → from-spec read-back → (doc_id, n_chars, text_md5). DuckDB
    // recomputes the projection straight from the source parquet, so any
    // framing/padding/encoding bug in EITHER direction breaks the hash.
    "q_wds_roundtrip" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val tmp = java.nio.file.Files.createTempDirectory("graft_wds")
        .toFile.getAbsolutePath
      graft.llm.WebDataset.write(docs, "doc_id", "text", tmp, nShards = 8)
      graft.llm.WebDataset.read(s, tmp)
        .filter(col("name").endsWith(".txt"))
        .select(
          regexp_extract(col("name"), "(\\d+)\\.txt$", 1).cast("long").as("doc_id"),
          length(col("content").cast("string")).as("n_chars"),
          md5(col("content")).as("text_md5"))
    }),

    // Multimodal WebDataset egress (L64 × L11): the committed media
    // fixture's png/bmp/jpg/wav/mp4/bin payloads ride as BINARY members
    // next to each sample's <key>.txt/<key>.json pair, round-trip through
    // the from-spec ustar write+read, and the raw member BYTES are
    // compared against DuckDB's read_blob over the same fixture files —
    // content equality, stronger than a digest, fully independent of the
    // Scala tar code in both directions.
    "q_wds_media" -> ((s, _) => {
      val media = mediaRecords(s).toDF()
        .withColumn("ext",
          when(col("media_type") === "image/jpeg", "jpg")
            .when(col("media_type") === "application/octet-stream", "bin")
            .otherwise(regexp_extract(col("media_type"), "/([a-z0-9]+)$", 1)))
        .withColumn("text", col("media_type"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_wds_media")
        .toFile.getAbsolutePath
      graft.llm.WebDataset.write(media, "doc_id", "text", tmp, nShards = 4,
        binaryMembers = Seq("payload" -> "ext"))
      graft.llm.WebDataset.read(s, tmp)
        .filter(!col("name").endsWith(".txt") && !col("name").endsWith(".json"))
        .select(
          regexp_extract(col("name"), "(\\d+)\\.", 1).cast("long").as("doc_id"),
          regexp_extract(col("name"), "\\.([a-z0-9]+)$", 1).as("ext"),
          col("size").cast("long").as("n_bytes"),
          // full-content equality; hex instead of raw bytes because the
          // compare harness sorts rows by every column and raw blobs are
          // unsortable in pandas — the byte string is still compared whole
          hex(col("content")).as("content_hex"))
    }),

    // --------------------------------------------------------- URL kernels

    // GRAFT-URL v1 parse + CANON v1 + PSL v1 over a deterministically
    // constructed URL grid (schemes incl. uppercase/unknown, userinfo,
    // IPv4/IPv6 hosts, multi-label suffixes, unknown TLDs, explicit/
    // default/bare ports, empty paths/queries, fragments). The Spark side
    // is the compiled single-pass kernel (GraftUrlOps); the oracle
    // re-parses with DuckDB regexes from the RFC 3986 appendix-B reference
    // pattern — a full cross-engine check of the hand loop.
    "q_url_parse" -> ((s, dir) => {
      import graft.functions.GraftUrlOps._
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), expr(urlConstructSql("STRING")).as("url"))
        .select(col("doc_id"), col("url"),
          urlSchemeCol(col("url")).as("scheme"),
          urlHostCol(col("url")).as("host"),
          urlPortCol(col("url")).as("port"),
          urlPathCol(col("url")).as("path"),
          urlQueryCol(col("url")).as("qs"),
          urlFragmentCol(col("url")).as("frag"),
          urlCanonicalCol(col("url")).as("canon"),
          registrableDomainCol(urlHostCol(col("url"))).as("domain"))
    }),

    // per-registrable-domain cap (C4/RefinedWeb "no domain dominates"):
    // kernel domain derivation + the L53-family hash-priority window
    "q_domain_cap" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), expr(urlConstructSql("STRING")).as("url"))
      Mixture.domainCap(docs, "doc_id", "url", perDomain = 3)
        .select("doc_id", "domain")
    }),

    // GRAFT-CLEAN v1 text normalization: Unicode NFC (JDK Normalizer
    // kernel vs DuckDB nfc_normalize/utf8proc — two independent UAX #15
    // implementations) + C0-control strip, over the corpus with
    // deterministic combining-mark / singleton / compatibility /
    // control suffixes appended so the normalization actually fires
    "q_clean_text" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val suffixed = docs.select(col("doc_id"),
        concat(col("text"), element_at(typedlit(cleanSuffixes),
          (pmod(col("doc_id"), lit(5)) + 1).cast("int"))).as("text"))
      TextAnalysis.cleanText(suffixed, "text")
        .select(col("doc_id"), col("clean_text"), col("changed"),
          length(col("clean_text")).as("n_clean"))
    }),

    // downsample to a TARGET mixture: integer-ppm rates from exact
    // counts, deterministic hash draw — the Pile/Dolma reweighting pass
    "q_mixture_rebalance" -> ((s, dir) =>
      Mixture.rebalance(
        s.read.parquet(s"$dir/documents.parquet").select("doc_id", "source"),
        "doc_id", "source", rebalanceTargets)),

    // exact-phrase search over the positional inverted index: term-
    // pruned posting reads, k-1 (doc_id, pos) equi-joins
    "q_phrase_search" -> ((s, dir) => {
      val idx = Retrieval.positionalIndex(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
      Retrieval.phraseSearch(idx, Seq("value", "table", "part"))
    }),

    // unordered two-term proximity over the same index
    "q_proximity_search" -> ((s, dir) => {
      val idx = Retrieval.positionalIndex(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
      Retrieval.proximitySearch(idx, "table", "value", window = 3)
    }),

    // CRAWL -> CORPUS end to end, one oracled query: WARC scan (pushed
    // response/200 predicates) -> GRAFT-HTML-TEXT extraction -> GRAFT-
    // CLEAN normalization -> Gopher/C4 quality gate. The oracle rebuilds
    // the same chain from the independently-computed html.parser text
    // expectations — the whole ingestion ladder has to agree.
    "q_crawl_curate" -> ((s, _) => {
      val texts = s.read
        .format(classOf[graft.sources.WarcSource].getName)
        .option("path", warcGz)
        .load()
        .filter(col("record_type") === "response" && col("http_status") === 200 &&
          col("http_content_type").startsWith("text/html"))
        .select(col("record_idx").as("doc_id"),
          graft.functions.GraftHtmlOps.htmlTextCol(col("payload").cast("string")).as("text"))
      val cleaned = TextAnalysis.cleanText(texts, "text")
        .select(col("doc_id"), col("clean_text").as("text"))
      TextAnalysis.qualityScore(cleaned, "doc_id", "text")
    }),

    // Count-Min sketch over the corpus tokens: the WHOLE 4x256 counter
    // grid hash-checks against a DuckDB group-by mirror of the same
    // portable hash family (estimates are min-of-rows projections over
    // this grid — pinned against exact counts in CountMinSpec)
    "q_countmin" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      docs.select(explode(graft.llm.TextHash.wordTokens(col("text"))).as("token"))
        .agg(graft.functions.CountMin(col("token"), depth = 4, width = 256).as("sk"))
        .select(posexplode(col("sk")).as(Seq("pos", "cnt")))
        .filter(col("cnt") > 0)
        .select(col("pos").cast("int").as("pos"), col("cnt"))
    }),

    // PII redaction (the apply side of q_pii): email -> phone -> IPv4
    // replace-all with typed placeholders, over the corpus with
    // deterministic PII-bearing suffixes appended so every pattern fires
    "q_redact" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      TextAnalysis.redactPii(
        docs.select(col("doc_id"),
          concat(col("text"), expr(piiSuffixSql("STRING"))).as("text")),
        "doc_id", "text")
    })
  )

  /** Deterministic PII-bearing suffixes shared by q_redact and its
    * oracle (identical SQL modulo the string-cast type name). */
  private def piiSuffixSql(castT: String): String =
    s"""CASE doc_id % 4
       |  WHEN 0 THEN concat(' contact bob', CAST(doc_id AS $castT),
       |    '@mail.example.com or x@y.io now')
       |  WHEN 1 THEN ' call 555-123-4567 or 555.987.6543 today'
       |  WHEN 2 THEN concat(' peer 10.0.', CAST(doc_id % 200 AS $castT),
       |    '.7 and 192.168.1.1 logged')
       |  ELSE ''
       |END""".stripMargin

  /** Deterministic normalization-exercising suffixes shared by
    * q_clean_text and its oracle: combining marks (compose under NFC),
    * the U+212B→U+00C5 singleton, compatibility chars NFC must KEEP
    * (fi-ligature, fullwidth A — NFKC territory), stripped controls. */
  private val cleanSuffixes: Seq[String] = Seq(
    " cafe\u0301 du\u0300",        // e+U+0301, u+U+0300 -> compose under NFC
    " \u212B vs \u0041\u030A",     // ANGSTROM SIGN + A+ring -> both U+00C5
    " \uFB01le \uFF21",            // fi-ligature + fullwidth A: NFC keeps them
    " ctrl\u0007bell\u000Bvt\u007F", // BEL/VT/DEL stripped by the C0 class
    "")

  /** Target mixture shared by q_mixture_rebalance and its oracle: five
    * named strata get shares (others drop). Each source is 5% of the
    * corpus, so src0 (2% target) draws at ~40%, src1 (5%) keeps exactly
    * whole at rate 1e6, and src2-4 are over-demanded — the cap path. */
  private val rebalanceTargets: Map[String, Long] = Map(
    "src0" -> 20000L, "src1" -> 50000L, "src2" -> 200000L,
    "src3" -> 300000L, "src4" -> 430000L)

  /** Deterministic URL grid shared by the q_url_* queries and their
    * oracles — identical SQL modulo the string-cast type name
    * (Spark STRING / DuckDB VARCHAR). */
  private def urlConstructSql(castT: String): String = {
    def c(e: String) = s"CAST($e AS $castT)"
    s"""concat(
       |  CASE doc_id % 7 WHEN 0 THEN 'HTTP' WHEN 4 THEN 'ftp'
       |    WHEN 6 THEN 'Other' ELSE 'https' END,
       |  '://',
       |  CASE WHEN doc_id % 11 = 0 THEN 'user:pw@' ELSE '' END,
       |  CASE WHEN doc_id % 13 = 0 THEN '10.0.0.1'
       |       WHEN doc_id % 13 = 1 THEN '[2001:DB8::1]'
       |       ELSE concat(
       |         CASE WHEN doc_id % 3 = 0 THEN 'WWW.'
       |              WHEN doc_id % 3 = 1 THEN 'a.b.' ELSE '' END,
       |         source, '.',
       |         CASE doc_id % 6 WHEN 0 THEN 'com' WHEN 1 THEN 'co.uk'
       |           WHEN 2 THEN 'ac.uk' WHEN 3 THEN 'com.au'
       |           WHEN 4 THEN 'io' ELSE 'unknowntld' END)
       |  END,
       |  CASE doc_id % 5
       |    WHEN 0 THEN CASE WHEN doc_id % 2 = 0 THEN ':8080' ELSE ':065535' END
       |    WHEN 1 THEN ':443'
       |    WHEN 2 THEN ':'
       |    WHEN 3 THEN CASE WHEN doc_id % 2 = 0 THEN ':65536'
       |      ELSE ':99999999999999999999' END
       |    ELSE '' END,
       |  CASE doc_id % 4 WHEN 0 THEN '' WHEN 1 THEN '/'
       |    WHEN 2 THEN concat('/docs/', ${c("doc_id")}, '/view')
       |    ELSE '/a%20b' END,
       |  CASE doc_id % 3 WHEN 0 THEN concat('?id=', ${c("doc_id")}, '&b=2&a=1')
       |    WHEN 1 THEN '?' ELSE '' END,
       |  CASE WHEN doc_id % 9 = 0 THEN '#section-2' ELSE '' END)""".stripMargin
  }

  // -------------------------------------------------------------- oracles

  /** The q_tag_taxonomy topic→keywords table (shared by query and
    * oracle so the two can never drift). */
  private val taxonomyV: Seq[(String, Seq[String])] = Seq(
    "relational" -> Seq("join", "table", "scan"),
    "streaming" -> Seq("stream", "window", "batch"),
    "fragments" -> Seq("a", "or", "ta"))

  /** DuckDB mirror of one keyword's all-start-position (overlapping)
    * occurrence count in `text` — the [[graft.functions.GraftKeywordOps]]
    * contract. */
  private def kwCountSql(kw: String): String =
    s"COALESCE(len(list_filter(generate_series(1, len(text) - ${kw.length} + 1), " +
      s"i -> substr(text, i, ${kw.length}) = '$kw')), 0)"

  /** Mirror of [[Profile.profile]] over documents: per-column UNION ALL,
    * each with its own KMV bottom-64 chain (the q_distinct_kmv mirror
    * applied per column; numerics hash their canonical decimal string).
    * Shared verbatim by `q_profile` (one-pass) and `q_profile_incr`
    * (per-drop states merged) — the two plans must land on the same
    * report to the bit. */
  private def profileOracleSql: String = {
    val cols = Seq(
      ("doc_id", true), ("text", false), ("lang", false),
      ("source", false), ("n_chars", true))
    val ctes = cols.map { case (c, numeric) =>
      val sexpr = if (numeric) s"CAST($c AS VARCHAR)" else c
      s"""pk_$c AS (
         |  SELECT DISTINCT
         |    ((${polyHashSql(sexpr)} * 1000003 + 17) % $P * 1000003 + 17) % $P AS h
         |  FROM documents WHERE $c IS NOT NULL),
         |pr_$c AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h ASC) AS rn FROM pk_$c),
         |pa_$c AS (SELECT COUNT(*) AS nd, MAX(CASE WHEN rn = 64 THEN h END) AS kth
         |  FROM pr_$c WHERE rn <= 64)""".stripMargin
    }.mkString(",\n")
    val rows = cols.map { case (c, numeric) =>
      s"""SELECT '$c' AS col_name,
         |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_rows,
         |  (SELECT CAST(count(*) - count($c) AS BIGINT) FROM documents) AS n_nulls,
         |  (SELECT CAST(CASE WHEN nd < 64 THEN nd
         |     ELSE (63 * CAST($P AS BIGINT)) // kth END AS BIGINT) FROM pa_$c)
         |    AS n_distinct,
         |  (SELECT nd < 64 FROM pa_$c) AS is_exact,
         |  ${if (numeric) s"(SELECT CAST(min($c) AS DOUBLE) FROM documents)"
            else "CAST(NULL AS DOUBLE)"} AS min_num,
         |  ${if (numeric) s"(SELECT CAST(max($c) AS DOUBLE) FROM documents)"
            else "CAST(NULL AS DOUBLE)"} AS max_num,
         |  ${if (numeric) "CAST(NULL AS VARCHAR)"
            else s"(SELECT min($c) FROM documents)"} AS min_str,
         |  ${if (numeric) "CAST(NULL AS VARCHAR)"
            else s"(SELECT max($c) FROM documents)"} AS max_str,
         |  ${if (numeric) "CAST(NULL AS BIGINT)"
            else s"(SELECT CAST(sum(length($c)) AS BIGINT) FROM documents)"}
         |    AS total_len""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH $ctes\n$rows"
  }

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      s"""SELECT min(doc_id) AS keep_id, md5(text) AS text_md5, count(*) AS n_copies
         |FROM documents
         |GROUP BY md5(text)""".stripMargin,

    "q_dedup_incremental" ->
      s"""WITH seen AS (SELECT md5(text) AS text_md5 FROM documents WHERE doc_id < 250),
         |fresh AS (
         |  SELECT doc_id, md5(text) AS text_md5 FROM documents WHERE doc_id >= 250)
         |SELECT min(doc_id) AS keep_id, text_md5
         |FROM fresh
         |WHERE text_md5 NOT IN (SELECT text_md5 FROM seen)
         |GROUP BY text_md5""".stripMargin,

    "q_dedup_minhash" -> lshPairsSql(
      shinglesSql("text", 5),
      perms = 64, nBands = 16, rowsPerBand = 4, minJaccard = 0.5, maxBucket = 64),

    // transitive closure over the same pair set; min reachable id = cluster
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE pairs_q AS (
         |${lshPairsSql(shinglesSql("text", 5),
              perms = 64, nBands = 16, rowsPerBand = 4, minJaccard = 0.5, maxBucket = 64)}),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs_q
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs_q),
         |reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b)
         |SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a""".stripMargin,

    // the q_dedup_clusters closure + the qualityCte score + a ranked
    // window: the three proven chains composed
    "q_cluster_rep" ->
      s"""WITH RECURSIVE ${qualityCte.stripPrefix("WITH ")},
         |pairs_q AS (
         |${lshPairsSql(shinglesSql("text", 5),
              perms = 64, nBands = 16, rowsPerBand = 4, minJaccard = 0.5, maxBucket = 64)}),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs_q
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs_q),
         |reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
         |cl AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a)
         |SELECT cl.doc_id, cl.cluster_id, sc.quality_score,
         |  (ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
         |    ORDER BY sc.quality_score DESC, cl.doc_id ASC)) = 1 AS is_rep
         |FROM cl JOIN sc USING (doc_id)""".stripMargin,

    "q_simhash_fingerprint" -> (simhashSql + " SELECT doc_id, simhash FROM sim"),

    "q_dedup_simhash" ->
      s"""$simhashSql,
         |banded AS (
         |  SELECT doc_id, simhash, b.band, (simhash >> (6 * b.band)) & 63 AS band_val
         |  FROM sim, (SELECT unnest(generate_series(0, 3)) AS band) b),
         |buckets AS (
         |  SELECT band, band_val,
         |    list(struct_pack(doc_id := doc_id, simhash := simhash)) AS ids
         |  FROM banded GROUP BY 1, 2),
         |pairs AS (
         |  SELECT DISTINCT p.doc_a AS doc_a, p.doc_b AS doc_b, p.hamming AS hamming FROM (
         |    SELECT unnest(flatten(list_transform(ids, x ->
         |      list_transform(list_filter(ids, y -> y > x), y ->
         |        struct_pack(doc_a := x.doc_id, doc_b := y.doc_id,
         |          hamming := CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER)))))) AS p
         |    FROM buckets WHERE len(ids) BETWEEN 2 AND 256))
         |SELECT * FROM pairs WHERE hamming <= 2""".stripMargin,

    // bipartite mirror of lshPairsSql: candidates cross sides only, bucket
    // cap over the combined membership (both sides together cover the whole
    // documents table, so `bands` is the union Dedup builds)
    "q_minhash_incr" -> {
      val minAgree = math.ceil((0.5 - 0.15) * 64).toInt
      s"""${lshBandsCte(shinglesSql("text", 5), perms = 64, nBands = 16, rowsPerBand = 4, source = "documents")},
         |okk AS (
         |  SELECT band, bh FROM bands GROUP BY band, bh HAVING count(*) <= 64),
         |cand AS (
         |  SELECT DISTINCT n.doc_id AS new_id, h.doc_id AS hist_id
         |  FROM bands n
         |  JOIN bands h ON n.band = h.band AND n.bh = h.bh
         |  JOIN okk k ON k.band = n.band AND k.bh = n.bh
         |  WHERE n.doc_id >= 250 AND h.doc_id < 250),
         |screened AS (
         |  SELECT c.new_id, c.hist_id FROM cand c
         |  JOIN sig sa ON sa.doc_id = c.new_id
         |  JOIN sig sb ON sb.doc_id = c.hist_id
         |  WHERE len(list_filter(generate_series(1, 64), i -> sa.sig[i] = sb.sig[i]))
         |    >= $minAgree)
         |SELECT new_id, hist_id, jaccard FROM (
         |  SELECT c.new_id, c.hist_id,
         |    CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
         |      / (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))) AS jaccard
         |  FROM screened c
         |  JOIN sh x ON x.doc_id = c.new_id
         |  JOIN sh y ON y.doc_id = c.hist_id)
         |WHERE jaccard >= CAST(0.5 AS DOUBLE)""".stripMargin
    },

    // gaps-and-islands over positions whose word 5-gram occurs in >= 2 docs
    "q_dup_spans" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $tokensSql AS t FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    CASE WHEN len(t) >= 5 THEN list_transform(generate_series(1, len(t) - 4), i ->
         |      ${polyHashSql("t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]", "ci")})
         |    ELSE CAST([] AS BIGINT[]) END AS gh
         |  FROM toks),
         |pos AS (
         |  SELECT doc_id,
         |    unnest(list_transform(generate_series(1, len(gh)), i -> {pos: i, gram: gh[i]}),
         |      recursive := true)
         |  FROM g),
         |dfreq AS (SELECT gram, count(DISTINCT doc_id) AS gram_docs FROM pos GROUP BY 1),
         |marked AS (
         |  SELECT p.doc_id, p.pos, (f.gram_docs >= 2) AS is_dup
         |  FROM pos p JOIN dfreq f USING (gram)),
         |runs AS (
         |  SELECT doc_id, is_dup,
         |    CASE WHEN is_dup THEN
         |      pos - row_number() OVER (PARTITION BY doc_id, is_dup ORDER BY pos) END AS run_key
         |  FROM marked),
         |rl AS (SELECT doc_id, is_dup, run_key, count(*) AS run_len FROM runs GROUP BY 1, 2, 3),
         |per AS (
         |  SELECT doc_id,
         |    CAST(sum(run_len) AS BIGINT) AS n_grams,
         |    CAST(coalesce(sum(run_len) FILTER (is_dup), 0) AS BIGINT) AS dup_grams,
         |    CAST(coalesce(count(*) FILTER (is_dup), 0) AS BIGINT) AS n_spans,
         |    CAST(coalesce(max(run_len) FILTER (is_dup), 0) AS BIGINT) AS max_span
         |  FROM rl GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(p.n_grams, 0) AS n_grams,
         |  coalesce(p.dup_grams, 0) AS dup_grams,
         |  coalesce(p.n_spans, 0) AS n_spans,
         |  coalesce(p.max_span, 0) AS max_span,
         |  CASE WHEN coalesce(p.n_grams, 0) > 0
         |    THEN CAST(p.dup_grams AS DOUBLE) / p.n_grams
         |    ELSE CAST(0 AS DOUBLE) END AS dup_fraction
         |FROM documents d LEFT JOIN per p USING (doc_id)""".stripMargin,

    // drop every token covered by a cross-doc duplicated 5-gram, rebuild
    // the text from the ordered survivors
    "q_dup_remove" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $tokensSql AS t FROM documents),
         |tok AS (
         |  SELECT doc_id,
         |    unnest(list_transform(generate_series(1, len(t)), i -> {tok_idx: i, token: t[i]}),
         |      recursive := true)
         |  FROM toks),
         |g AS (
         |  SELECT doc_id,
         |    CASE WHEN len(t) >= 5 THEN list_transform(generate_series(1, len(t) - 4), i ->
         |      ${polyHashSql("t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]", "ci")})
         |    ELSE CAST([] AS BIGINT[]) END AS gh
         |  FROM toks),
         |pos AS (
         |  SELECT doc_id,
         |    unnest(list_transform(generate_series(1, len(gh)), i -> {pos: i, gram: gh[i]}),
         |      recursive := true)
         |  FROM g),
         |dfreq AS (SELECT gram, count(DISTINCT doc_id) AS gram_docs FROM pos GROUP BY 1),
         |drop_set AS (
         |  SELECT DISTINCT doc_id, tok_idx FROM (
         |    SELECT p.doc_id, unnest(generate_series(p.pos, p.pos + 4)) AS tok_idx
         |    FROM pos p JOIN dfreq f USING (gram) WHERE f.gram_docs >= 2)),
         |kept AS (
         |  SELECT k.doc_id, k.tok_idx, k.token
         |  FROM tok k ANTI JOIN drop_set d USING (doc_id, tok_idx)),
         |rebuilt AS (
         |  SELECT doc_id, count(*) AS kept_tokens,
         |    string_agg(token, ' ' ORDER BY tok_idx) AS text_clean
         |  FROM kept GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(len($tokensSql) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(r.kept_tokens, 0) AS BIGINT) AS kept_tokens,
         |  coalesce(r.text_clean, '') AS text_clean
         |FROM documents d LEFT JOIN rebuilt r USING (doc_id)""".stripMargin,

    "q_dedup_ngram" -> lshPairsSql(
      s"list_distinct(list_transform(generate_series(1, len($tokensSql) - 2), " +
        s"i -> $tokensSql[i] || ' ' || $tokensSql[i+1] || ' ' || $tokensSql[i+2]))",
      perms = 64, nBands = 32, rowsPerBand = 2, minJaccard = 0.5, maxBucket = 64),

    "q_dedup_embedding" ->
      s"""WITH $embCte,
         |b AS (
         |  SELECT vec_id, v, sqrt(${dotSql("v", "v", 64)}) AS norm,
         |    ${bucketSql(6)} AS bucket
         |  FROM e)
         |SELECT vec_a, vec_b, cosine FROM (
         |  SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
         |    (${dotSql("a.v", "b2.v", 64)} / (a.norm * b2.norm)) AS cosine
         |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
         |WHERE cosine >= CAST(0.3 AS DOUBLE)""".stripMargin,

    "q_ann_lsh" ->
      s"""WITH $embCte,
         |b AS (
         |  SELECT vec_id, v, sqrt(${dotSql("v", "v", 64)}) AS norm,
         |    ${bucketSql(4)} AS bucket
         |  FROM e),
         |q AS (SELECT bucket, vec_id AS query_id, v AS vq, norm AS nq FROM b WHERE vec_id < 8),
         |scored AS (
         |  SELECT q.query_id, c.vec_id AS neighbor_id,
         |    (${dotSql("q.vq", "c.v", 64)} / (q.nq * c.norm)) AS cosine
         |  FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id <> q.query_id),
         |ranked AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 10""".stripMargin,

    "q_ann_topk" ->
      s"""WITH $embCte,
         |q AS (SELECT vec_id AS query_id, v AS vq FROM e WHERE vec_id < 8),
         |scored AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |    ${cosineSql("q.vq", "e.v", 64)} AS cosine
         |  FROM q JOIN e ON e.vec_id <> q.query_id),
         |ranked AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 10""".stripMargin,

    "q_ann_multiprobe" ->
      s"""WITH $embCte,
         |b AS (
         |  SELECT vec_id, v, sqrt(${dotSql("v", "v", 64)}) AS norm,
         |    ${bucketSql(4)} AS bucket
         |  FROM e),
         |q AS (
         |  SELECT p.probe AS bucket, vec_id AS query_id, v AS vq, norm AS nq
         |  FROM b, unnest([bucket, xor(bucket, 1), xor(bucket, 2)]) AS p(probe)
         |  WHERE vec_id < 8),
         |scored AS (
         |  SELECT q.query_id, c.vec_id AS neighbor_id,
         |    (${dotSql("q.vq", "c.v", 64)} / (q.nq * c.norm)) AS cosine
         |  FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id <> q.query_id),
         |ranked AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 10""".stripMargin,

    "q_chunk" ->
      s"""WITH tok AS (SELECT doc_id, $tokensSql AS t, len($tokensSql) AS n FROM documents),
         |c AS (
         |  SELECT doc_id, t, n,
         |    CASE WHEN n <= 64 THEN 1 ELSE 1 + ((n - 64) + 47) // 48 END AS nch
         |  FROM tok),
         |x AS (
         |  SELECT doc_id, t, n, unnest(generate_series(0, nch - 1)) AS ci FROM c)
         |SELECT doc_id, CAST(ci AS INTEGER) AS chunk_idx,
         |  CAST(LEAST(ci * 48 + 64, n) - ci * 48 AS INTEGER) AS n_chunk_tokens,
         |  array_to_string(t[ci * 48 + 1:LEAST(ci * 48 + 64, n)], ' ') AS chunk_text
         |FROM x""".stripMargin,

    "q_repetition" ->
      s"""WITH tok AS (SELECT doc_id, $tokensSql AS t FROM documents),
         |h AS (
         |  SELECT doc_id, list_transform(t, s -> ${polyHashSql("s", "ci")}) AS th, len(t) AS n
         |  FROM tok),
         |tc AS (
         |  SELECT doc_id, max(c) AS top_count FROM (
         |    SELECT doc_id, hv, count(*) AS c
         |    FROM (SELECT doc_id, unnest(th) AS hv FROM h) GROUP BY 1, 2)
         |  GROUP BY 1),
         |g AS (
         |  SELECT doc_id,
         |    len(list_distinct(list_transform(
         |      list_transform(generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1]),
         |      s -> ${polyHashSql("s", "ci")}))) AS d2,
         |    len(list_distinct(list_transform(
         |      list_transform(generate_series(1, len(t) - 2),
         |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
         |      s -> ${polyHashSql("s", "ci")}))) AS d3
         |  FROM tok)
         |SELECT h.doc_id,
         |  h.n AS n_tokens,
         |  CAST(tc.top_count AS INTEGER) AS top_token_count,
         |  CAST(tc.top_count AS DOUBLE) / h.n AS top_token_ratio,
         |  CASE WHEN h.n - 1 <= 0 THEN CAST(0 AS DOUBLE)
         |       ELSE CAST(1 AS DOUBLE) - CAST(g.d2 AS DOUBLE) / (h.n - 1) END
         |    AS dup_bigram_ratio,
         |  CASE WHEN h.n - 2 <= 0 THEN CAST(0 AS DOUBLE)
         |       ELSE CAST(1 AS DOUBLE) - CAST(g.d3 AS DOUBLE) / (h.n - 2) END
         |    AS dup_trigram_ratio
         |FROM h JOIN tc USING (doc_id) JOIN g USING (doc_id)""".stripMargin,

    "q_corpus_report" ->
      s"""$qualityCte,
         |qb AS (
         |  SELECT doc_id,
         |    CASE WHEN quality_score >= CAST(0.7 AS DOUBLE) THEN 'high'
         |         WHEN quality_score >= CAST(0.4 AS DOUBLE) THEN 'medium'
         |         ELSE 'low' END AS quality_bucket
         |  FROM sc)
         |SELECT count(*) AS n_docs,
         |  CAST(sum(d.n_chars) AS BIGINT) AS n_chars_total,
         |  count(DISTINCT d.lang) AS n_langs,
         |  count(DISTINCT d.source) AS n_sources,
         |  CAST(sum(CASE WHEN qb.quality_bucket = 'high' THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
         |  CAST(sum(CASE WHEN qb.quality_bucket = 'medium' THEN 1 ELSE 0 END) AS BIGINT) AS n_medium,
         |  CAST(sum(CASE WHEN qb.quality_bucket = 'low' THEN 1 ELSE 0 END) AS BIGINT) AS n_low
         |FROM documents d JOIN qb USING (doc_id)""".stripMargin,

    "q_mixture" ->
      s"""WITH t AS (
         |  SELECT CAST(count(*) AS BIGINT) AS total_docs,
         |    CAST(sum(n_chars) AS BIGINT) AS total_chars
         |  FROM documents)
         |SELECT source, lang,
         |  count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
         |  CAST(count(*) AS DOUBLE) / t.total_docs AS doc_share,
         |  CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) / t.total_chars AS char_share
         |FROM documents, t
         |GROUP BY source, lang, t.total_docs, t.total_chars""".stripMargin,

    "q_stratified_sample" ->
      s"""SELECT doc_id, source FROM (
         |  SELECT doc_id, source,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY ((doc_id * 1000003 + 17) % ${TextHash.Prime}) % 100 ASC,
         |               doc_id ASC) AS rn
         |  FROM documents)
         |WHERE rn <= 10""".stripMargin,

    "q_budget_sample" ->
      s"""WITH r AS (
         |  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_tokens,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY ((doc_id * 1000003 + 17) % $P) % 100 ASC, doc_id ASC)
         |      AS INTEGER) AS take_order,
         |    CAST(COALESCE(SUM(n_chars) OVER (PARTITION BY source
         |      ORDER BY ((doc_id * 1000003 + 17) % $P) % 100 ASC, doc_id ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS cum_before
         |  FROM documents)
         |SELECT doc_id, source, n_tokens, take_order, cum_before
         |FROM r WHERE cum_before < 3000""".stripMargin,

    // mirror of Profile.profile over documents: per-column UNION ALL,
    // each with its own KMV bottom-64 chain (the q_distinct_kmv mirror
    // applied per column; numerics hash their canonical decimal string)
    // global token positions via a running-sum window over doc order,
    // first occurrence per token, strict-before counts at each N*i/8 cut
    "q_vocab_growth" ->
      s"""WITH tok0 AS (SELECT doc_id, $tokensSql AS t FROM documents),
         |cnt AS (SELECT doc_id,
         |  CASE WHEN t IS NULL THEN 0 ELSE CAST(len(t) AS BIGINT) END AS n_t
         |  FROM tok0),
         |o AS (SELECT doc_id, CAST(COALESCE(SUM(n_t) OVER (ORDER BY doc_id ASC
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
         |  FROM cnt),
         |tk AS (SELECT t0.doc_id, unnest(generate_series(1, len(t0.t))) AS x, t0.t
         |  FROM tok0 t0),
         |tg AS (SELECT tk.t[tk.x] AS token, o.off + tk.x - 1 AS gpos
         |  FROM tk JOIN o USING (doc_id)),
         |fs AS (SELECT token, MIN(gpos) AS first_pos FROM tg GROUP BY 1),
         |nn AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n FROM cnt),
         |ck AS (SELECT unnest(generate_series(1, 8)) AS i)
         |SELECT CAST(ck.i AS INTEGER) AS checkpoint_no,
         |  CAST((nn.n * ck.i) // 8 AS BIGINT) AS checkpoint_tokens,
         |  CAST((SELECT count(*) FROM fs
         |        WHERE fs.first_pos < (nn.n * ck.i) // 8) AS BIGINT) AS n_distinct
         |FROM ck, nn""".stripMargin,

    // per-topic keyword tallies: each topic a UNION ALL branch, each
    // keyword the generate_series/substr all-occurrence count (the
    // kernel's overlapping-substring contract, mirrored per code point)
    "q_tag_taxonomy" -> taxonomyV.map { case (topic, kws) =>
      s"""SELECT doc_id, '$topic' AS topic,
         |  CAST(${kws.map(kwCountSql).mkString(" + ")} AS BIGINT) AS n_matches,
         |  CAST(${kws.map(k => s"CASE WHEN ${kwCountSql(k)} > 0 THEN 1 ELSE 0 END")
                .mkString(" + ")} AS BIGINT) AS n_keywords
         |FROM documents""".stripMargin
    }.mkString("\nUNION ALL\n"),

    "q_profile" -> profileOracleSql,

    // the INCREMENTAL profile (per-drop KMV/min/max/sum states merged)
    // is bit-identical to the one-pass profile of the union by
    // construction, so it shares the q_profile mirror verbatim — the
    // strongest possible check of the merge algebra
    "q_profile_incr" -> profileOracleSql,

    // exact mirror of the KMV sketch INCLUDING the estimate path: the
    // bottom-64 distinct hashes are partition-invariant, so the
    // (k-1)*M // kth integer estimator reproduces to the bit
    "q_distinct_kmv" ->
      s"""WITH tok AS (SELECT lang, unnest($tokensSql) AS token FROM documents),
         |h0 AS (SELECT DISTINCT lang, ${polyHashSql("token")} AS h FROM tok),
         |h AS (SELECT lang, ((h * 1000003 + 17) % $P * 1000003 + 17) % $P AS h FROM h0),
         |r AS (SELECT lang, h,
         |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h ASC) AS rn FROM h),
         |a AS (SELECT lang, COUNT(*) AS nd,
         |  MAX(CASE WHEN rn = 64 THEN h END) AS kth
         |  FROM r WHERE rn <= 64 GROUP BY lang)
         |SELECT lang,
         |  CAST(CASE WHEN nd < 64 THEN nd ELSE (63 * CAST($P AS BIGINT)) // kth END
         |    AS BIGINT) AS n_distinct,
         |  nd < 64 AS is_exact
         |FROM a""".stripMargin,

    "q_json_extract" ->
      s"""SELECT event_id, event_type,
         |  CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
         |FROM events""".stripMargin,

    "q_pack_shards" ->
      s"""SELECT doc_id, n_chars,
         |  ((doc_id * 1000003 + 17) % ${TextHash.Prime}) % 16 AS shard_id,
         |  CAST(COALESCE(SUM(n_chars) OVER (
         |    PARTITION BY ((doc_id * 1000003 + 17) % ${TextHash.Prime}) % 16
         |    ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
         |FROM documents""".stripMargin,

    "q_sample_split" ->
      s"""SELECT doc_id,
         |  ((doc_id * 1000003 + 17) % ${TextHash.Prime}) % 100 AS bucket,
         |  CASE WHEN ((doc_id * 1000003 + 17) % ${TextHash.Prime}) % 100 < 80 THEN 'train'
         |       WHEN ((doc_id * 1000003 + 17) % ${TextHash.Prime}) % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin,

    "q_pii" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text,
         |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text,
         |    '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(text,
         |    '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS BIGINT) AS n_ips,
         |  (len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}'))
         |   + len(regexp_extract_all(text, '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}'))
         |   + len(regexp_extract_all(text,
         |       '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}'))) > 0 AS has_pii
         |FROM documents""".stripMargin,

    "q_decontaminate" ->
      s"""WITH toks AS (SELECT doc_id, $tokensSql AS t FROM documents),
         |gr AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    list_distinct(list_transform(generate_series(1, len(t) - 2),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])),
         |    s -> ${polyHashSql("s", "ci")}))) AS g
         |  FROM toks),
         |bench AS (SELECT DISTINCT g FROM gr WHERE doc_id < 50),
         |tot AS (SELECT doc_id, count(*) AS n_grams FROM gr GROUP BY 1),
         |m AS (SELECT gr.doc_id, count(*) AS n_matched FROM gr JOIN bench USING (g) GROUP BY 1)
         |SELECT d2.doc_id,
         |  COALESCE(tot.n_grams, 0) AS n_grams,
         |  COALESCE(m.n_matched, 0) AS n_matched,
         |  CASE WHEN COALESCE(tot.n_grams, 0) = 0 THEN CAST(0 AS DOUBLE)
         |       ELSE CAST(COALESCE(m.n_matched, 0) AS DOUBLE) / tot.n_grams END
         |    AS contamination_ratio,
         |  (CASE WHEN COALESCE(tot.n_grams, 0) = 0 THEN CAST(0 AS DOUBLE)
         |        ELSE CAST(COALESCE(m.n_matched, 0) AS DOUBLE) / tot.n_grams END
         |   >= CAST(0.2 AS DOUBLE)) AS contaminated
         |FROM documents d2
         |LEFT JOIN tot USING (doc_id)
         |LEFT JOIN m USING (doc_id)""".stripMargin,

    // per-side bottom-256 scattered gram hashes, KMV-merged union, the
    // Beyer et al. membership-count Jaccard in integer ppm
    "q_corpus_overlap" -> {
      def side(name: String, pred: String): String =
        s"""t$name AS (SELECT $tokensSql AS t FROM documents WHERE $pred),
           |g$name AS (
           |  SELECT DISTINCT ((${polyHashSql("g")} * 1000003 + 17) % $P * 1000003 + 17) % $P AS h
           |  FROM (SELECT unnest(list_transform(generate_series(1, len(t) - 2),
           |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
           |    FROM t$name WHERE len(t) >= 3)),
           |r$name AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h ASC) AS rn FROM g$name),
           |k$name AS (SELECT COALESCE((SELECT list(h ORDER BY h ASC) FROM r$name WHERE rn <= 256), []) AS l)"""
          .stripMargin
      def est(l: String): String =
        s"CAST(CASE WHEN len($l) < 256 THEN len($l) ELSE (255 * CAST($P AS BIGINT)) // $l[256] END AS BIGINT)"
      s"""WITH ${side("a", "doc_id < 250")},
         |${side("b", "doc_id >= 250")},
         |ku AS (SELECT list_sort(list_distinct(ka.l || kb.l))[1:256] AS l FROM ka, kb)
         |SELECT
         |  CAST(CASE WHEN len(ku.l) = 0 THEN 0
         |    ELSE (1000000 * len(list_filter(ku.l, h ->
         |      list_contains(ka.l, h) AND list_contains(kb.l, h)))) // len(ku.l)
         |    END AS BIGINT) AS est_jaccard_ppm,
         |  ${est("ka.l")} AS est_distinct_a,
         |  ${est("kb.l")} AS est_distinct_b,
         |  ${est("ku.l")} AS est_distinct_union,
         |  len(ku.l) < 256 AS is_exact
         |FROM ku, ka, kb""".stripMargin
    },

    // mirror of Contamination.semantic (nPlanes=4, minCosine=0.8,
    // multiprobe=1): the q_dedup_embedding bucket/cosine machinery,
    // restricted to corpus (>= 50) × bench (< 50) with probe unnest
    "q_decontam_semantic" ->
      s"""WITH $embCte,
         |b AS (
         |  SELECT vec_id, v, sqrt(${dotSql("v", "v", 64)}) AS norm,
         |    ${bucketSql(4)} AS bucket
         |  FROM e),
         |be AS (
         |  SELECT p.probe AS bucket, vec_id AS bench_id, v AS vb, norm AS nb
         |  FROM b, unnest([bucket, xor(bucket, 1)]) AS p(probe)
         |  WHERE vec_id < 50 AND norm > 0),
         |cand AS (
         |  SELECT c.vec_id,
         |    (${dotSql("c.v", "be.vb", 64)} / (c.norm * be.nb)) AS cs
         |  FROM b c JOIN be ON c.bucket = be.bucket
         |  WHERE c.vec_id >= 50 AND c.norm > 0),
         |hits AS (
         |  SELECT vec_id, CAST(count(*) AS BIGINT) AS n_bench_hits,
         |    max(cs) AS max_cosine
         |  FROM cand WHERE cs >= CAST(0.8 AS DOUBLE) GROUP BY 1)
         |SELECT ev.vec_id,
         |  COALESCE(h.n_bench_hits, 0) AS n_bench_hits,
         |  COALESCE(h.max_cosine, CAST(0 AS DOUBLE)) AS max_cosine,
         |  h.n_bench_hits IS NOT NULL AS contaminated
         |FROM e ev LEFT JOIN hits h USING (vec_id)
         |WHERE ev.vec_id >= 50""".stripMargin,

    "q_embed_quantize" ->
      s"""WITH $embCte,
         |m AS (
         |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS max_abs FROM e),
         |s AS (
         |  SELECT vec_id, v,
         |    CASE WHEN max_abs = 0 THEN CAST(0 AS DOUBLE)
         |         ELSE CAST(127 AS DOUBLE) / max_abs END AS scale
         |  FROM m)
         |SELECT vec_id, CAST(g.j - 1 AS INTEGER) AS dim_idx,
         |  CAST(round(v[g.j] * scale) AS INTEGER) AS q, scale
         |FROM s, (SELECT unnest(generate_series(1, 64)) AS j) g""".stripMargin,

    // best-cell assignment of the fresh half against the seed quantizer;
    // same tiebreak and zero-norm exclusions as the q_ann_ivf assignment
    "q_ann_ivf_append" ->
      s"""WITH $embCte,
         |b AS (SELECT vec_id, v, sqrt(${dotSql("v", "v", 64)}) AS norm
         |      FROM e WHERE sqrt(${dotSql("v", "v", 64)}) > 0),
         |cent AS (SELECT vec_id AS centroid_id, v AS vc, norm AS nc
         |         FROM b WHERE vec_id < 16 AND norm > 0),
         |scored AS (
         |  SELECT b.vec_id, c.centroid_id,
         |    (${dotSql("b.v", "c.vc", 64)} / (b.norm * c.nc)) AS c_cos
         |  FROM b, cent c WHERE b.vec_id >= 250)
         |SELECT centroid_id AS cell, vec_id, c_cos FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY c_cos DESC, centroid_id ASC) AS rn
         |  FROM scored) WHERE rn = 1""".stripMargin,

    "q_ann_ivf" ->
      s"""WITH $embCte,
         |b AS (SELECT vec_id, v, sqrt(${dotSql("v", "v", 64)}) AS norm
         |      FROM e WHERE sqrt(${dotSql("v", "v", 64)}) > 0),
         |cent AS (SELECT vec_id AS centroid_id, v AS vc, norm AS nc
         |         FROM b WHERE vec_id < 16 AND norm > 0),
         |scored AS (
         |  SELECT b.vec_id, b.v, b.norm, c.centroid_id,
         |    (${dotSql("b.v", "c.vc", 64)} / (b.norm * c.nc)) AS c_cos
         |  FROM b, cent c),
         |assigned AS (
         |  SELECT centroid_id AS cell, vec_id AS neighbor_id, v AS vn, norm AS nn FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY c_cos DESC, centroid_id ASC) AS rn
         |    FROM scored) WHERE rn = 1),
         |probes AS (
         |  SELECT centroid_id AS cell, vec_id AS query_id, v AS vq, norm AS nq FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY c_cos DESC, centroid_id ASC) AS rn
         |    FROM scored WHERE vec_id < 8) WHERE rn <= 4),
         |cand AS (
         |  SELECT p.query_id, a.neighbor_id,
         |    (${dotSql("p.vq", "a.vn", 64)} / (p.nq * a.nn)) AS cosine
         |  FROM probes p JOIN assigned a USING (cell)
         |  WHERE a.neighbor_id <> p.query_id),
         |ranked AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
         |  FROM cand)
         |SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 10""".stripMargin,

    "q_winnow" ->
      s"""WITH g AS (
         |  SELECT doc_id,
         |    list_transform(generate_series(1, len(text) - 7), i ->
         |      ${polyHashSql("substr(text, i, 8)", "ci")}) AS gh
         |  FROM documents),
         |f AS (
         |  SELECT doc_id,
         |    list_sort(list_distinct(list_transform(generate_series(1, len(gh) - 3), j ->
         |      list_min(gh[j:j+3])))) AS fps
         |  FROM g WHERE len(gh) >= 4)
         |SELECT doc_id, unnest(fps) AS fingerprint FROM f""".stripMargin,

    "q_salted_agg" ->
      s"""SELECT event_type,
         |  count(*) AS n_events,
         |  CAST(sum(CAST(round(value * CAST(1000000 AS DOUBLE)) AS BIGINT)) AS BIGINT)
         |    AS value_micros,
         |  min(value) AS value_min,
         |  max(value) AS value_max
         |FROM events GROUP BY 1""".stripMargin,

    "q_bm25" -> bm25OracleSql,

    // the incremental index build is value-identical to the direct
    // computation (unique ids across drops keep (token, doc_id) a key and
    // df/stats exact) — the oracle IS q_bm25's: same SQL, same hashes
    "q_bm25_incr" -> bm25OracleSql,

    "q_tfidf" ->
      s"""WITH toks AS (
         |  SELECT doc_id, len($tokensSql) AS dl, unnest($tokensSql) AS token FROM documents),
         |post AS (
         |  SELECT token, doc_id, count(*) AS tf, min(dl) AS dl FROM toks GROUP BY 1, 2),
         |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |dfs AS (SELECT token, count(*) AS df FROM post GROUP BY 1)
         |SELECT p.doc_id, p.token, p.tf, d.df,
         |  CAST(round((CAST(p.tf AS DOUBLE) / p.dl)
         |    * (CAST(s.n_docs AS DOUBLE) / d.df) * 1000000) AS BIGINT) AS weight_micros
         |FROM post p JOIN dfs d USING (token), stats s""".stripMargin,

    "q_kmeans" -> {
      // two unrolled Lloyd rounds mirroring Clustering.kmeans: seeds are
      // the 8 smallest vec_ids (= vec_id < 8 on the dense 0-based
      // testdata); centroid components are micros-sum / (n * 1e6) so the
      // iteration is bit-exact on both engines; argmin ties by cluster id
      def distSql(v: String, c: String) =
        s"list_reduce(list_transform(generate_series(1, 64), i -> ($v[i] - $c[i]) * ($v[i] - $c[i])), (x, y) -> x + y)"
      s"""WITH $embCte,
         |c0 AS (SELECT vec_id AS cluster, v AS c FROM e WHERE vec_id < 8 AND v IS NOT NULL),
         |d1 AS (
         |  SELECT e.vec_id, e.v, c0.cluster, ${distSql("e.v", "c0.c")} AS dist
         |  FROM e, c0),
         |a1 AS (
         |  SELECT vec_id, v, cluster FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY dist ASC, cluster ASC) AS rn
         |    FROM d1) WHERE rn = 1),
         |u1 AS (
         |  SELECT cluster, g.dim,
         |    CAST(sum(CAST(round(v[g.dim] * 1000000) AS BIGINT)) AS BIGINT) AS s,
         |    count(*) AS n
         |  FROM a1, (SELECT unnest(generate_series(1, 64)) AS dim) g
         |  GROUP BY 1, 2),
         |c1 AS (
         |  SELECT cluster, list(CAST(s AS DOUBLE) / (n * 1000000) ORDER BY dim) AS c
         |  FROM u1 GROUP BY 1),
         |d2 AS (
         |  SELECT e.vec_id, c1.cluster, ${distSql("e.v", "c1.c")} AS dist
         |  FROM e, c1)
         |SELECT vec_id, cluster, CAST(round(dist * 1000000) AS BIGINT) AS dist_micros
         |FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY dist ASC, cluster ASC) AS rn
         |  FROM d2) WHERE rn = 1""".stripMargin
    },

    "q_kmeans_pp_seeds" -> {
      // unrolled farthest-first chain mirroring Clustering.farthestFirstSeeds:
      // each s<j> adds the vector with the LARGEST min-distance to the seeds
      // chosen so far (ties: smallest vec_id); distances are exact doubles
      // on both engines (sequential fold), reported in micros
      def distSql(v: String, c: String) =
        s"list_reduce(list_transform(generate_series(1, 64), i -> ($v[i] - $c[i]) * ($v[i] - $c[i])), (x, y) -> x + y)"
      val steps = (2 to 4).map { j =>
        s"""p$j AS (
           |  SELECT e.vec_id, min(${distSql("e.v", "s.c")}) AS dmin
           |  FROM e, s${j - 1} s
           |  WHERE e.vec_id NOT IN (SELECT cluster FROM s${j - 1})
           |  GROUP BY e.vec_id
           |  ORDER BY dmin DESC, e.vec_id ASC LIMIT 1),
           |n$j AS MATERIALIZED (
           |  SELECT e.vec_id AS cluster, e.v AS c,
           |    CAST(round(p$j.dmin * 1000000) AS BIGINT) AS dmin_micros
           |  FROM e, p$j WHERE e.vec_id = p$j.vec_id),
           |s$j AS MATERIALIZED (SELECT * FROM s${j - 1} UNION ALL SELECT * FROM n$j)""".stripMargin
      }.mkString(",\n")
      s"""WITH $embCte,
         |s1 AS (
         |  SELECT vec_id AS cluster, v AS c, CAST(0 AS BIGINT) AS dmin_micros
         |  FROM e WHERE v IS NOT NULL ORDER BY vec_id LIMIT 1),
         |$steps
         |SELECT cluster, dmin_micros FROM s4""".stripMargin
    },

    "q_kmeans_converged" -> {
      // farthest-first seeds (k=8) + the GUARDED 10-round Lloyd unroll
      // (see lloydConvergedSql): a full exact-hash oracle for the
      // movement-eps production loop, not a rows-only check
      s"""WITH $embCte,
         |${farthestFirstSeedSql(8)},
         |${lloydConvergedSql(rounds = 10, eps = 1e-6)},
         |fin AS (
         |  SELECT e.vec_id, c.cluster, ${sqDistSql("e.v", "c.c")} AS dist
         |  FROM e, c10 c)
         |SELECT vec_id, cluster,
         |  CAST(round(dist * 1000000) AS BIGINT) AS dist_micros
         |FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY dist ASC, cluster ASC) AS rn
         |  FROM fin) WHERE rn = 1""".stripMargin
    },

    "q_ann_ivf_trained" -> {
      // trained coarse quantizer = first-16 seeds + 3 guarded Lloyd
      // rounds (mirrors kmeansConvergedModel(k=16, eps=1e-6, maxIters=3,
      // farthestFirst=false)), then the exact q_ann_ivf search SQL over
      // the trained centroid table
      s"""WITH $embCte,
         |cs0 AS (SELECT vec_id AS cluster, v AS c FROM e WHERE v IS NOT NULL ORDER BY vec_id LIMIT 16),
         |${lloydConvergedSql(rounds = 3, eps = 1e-6)},
         |b AS (SELECT vec_id, v, sqrt(${dotSql("v", "v", 64)}) AS norm
         |      FROM e WHERE sqrt(${dotSql("v", "v", 64)}) > 0),
         |cent AS (SELECT cluster AS centroid_id, c AS vc,
         |           sqrt(${dotSql("c", "c", 64)}) AS nc
         |         FROM c3 WHERE sqrt(${dotSql("c", "c", 64)}) > 0),
         |scored AS (
         |  SELECT b.vec_id, b.v, b.norm, c.centroid_id,
         |    (${dotSql("b.v", "c.vc", 64)} / (b.norm * c.nc)) AS c_cos
         |  FROM b, cent c),
         |assigned AS (
         |  SELECT centroid_id AS cell, vec_id AS neighbor_id, v AS vn, norm AS nn FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY c_cos DESC, centroid_id ASC) AS rn
         |    FROM scored) WHERE rn = 1),
         |probes AS (
         |  SELECT centroid_id AS cell, vec_id AS query_id, v AS vq, norm AS nq FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY c_cos DESC, centroid_id ASC) AS rn
         |    FROM scored WHERE vec_id < 8) WHERE rn <= 4),
         |cand AS (
         |  SELECT p.query_id, a.neighbor_id,
         |    (${dotSql("p.vq", "a.vn", 64)} / (p.nq * a.nn)) AS cosine
         |  FROM probes p JOIN assigned a USING (cell)
         |  WHERE a.neighbor_id <> p.query_id),
         |ranked AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
         |  FROM cand)
         |SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 10""".stripMargin
    },

    "q_mixture_rollup" ->
      s"""SELECT source, lang,
         |  CAST(GROUPING(source, lang) AS BIGINT) AS grp,
         |  count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS n_chars_total
         |FROM documents
         |GROUP BY ROLLUP (source, lang)""".stripMargin,

    "q_pivot" ->
      s"""SELECT source,
         |  CAST(count(*) FILTER (WHERE lang = 'de') AS BIGINT) AS n_de,
         |  CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS n_en,
         |  CAST(count(*) FILTER (WHERE lang = 'es') AS BIGINT) AS n_es,
         |  CAST(count(*) FILTER (WHERE lang = 'fr') AS BIGINT) AS n_fr,
         |  CAST(count(*) FILTER (WHERE lang = 'zh') AS BIGINT) AS n_zh
         |FROM documents GROUP BY source""".stripMargin,

    "q_moving_avg" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         |    CAST(round(value * CAST(1000000 AS DOUBLE)) AS BIGINT) AS value_micros
         |  FROM events)
         |SELECT event_id, user_id, ts_us, value_micros,
         |  lag(value_micros) OVER w AS prev_value_micros,
         |  lead(value_micros) OVER w AS next_value_micros,
         |  CAST(sum(value_micros) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving_sum_micros,
         |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_in_window,
         |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq
         |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)""".stripMargin,

    "q_rank_stats" ->
      s"""SELECT event_id, event_type, value,
         |  CAST(rank() OVER w AS BIGINT) AS rnk,
         |  percent_rank() OVER w AS pct_rank,
         |  cume_dist() OVER w AS cume,
         |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
         |FROM events WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)""".stripMargin,

    "q_histogram" ->
      s"""WITH b AS (
         |  SELECT event_type, value,
         |    least(greatest(CAST(floor((value - CAST(0 AS DOUBLE)) / CAST(25 AS DOUBLE)) AS BIGINT),
         |      0), 19) AS bucket
         |  FROM events)
         |SELECT event_type, bucket,
         |  count(*) AS n_events,
         |  CAST(sum(CAST(round(value * CAST(1000000 AS DOUBLE)) AS BIGINT)) AS BIGINT)
         |    AS value_micros,
         |  CAST(0 AS DOUBLE) + bucket * CAST(25 AS DOUBLE) AS bucket_lo
         |FROM b GROUP BY 1, 2""".stripMargin,

    "q_seq_pack" ->
      s"""WITH toks AS (
         |  SELECT doc_id, CAST(len($tokensSql) AS BIGINT) AS n_tokens FROM documents),
         |o AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
         |  FROM toks)
         |SELECT doc_id, n_tokens, start_offset,
         |  start_offset // 128 AS first_seq,
         |  (start_offset + n_tokens - 1) // 128 AS last_seq,
         |  (start_offset + n_tokens - 1) // 128 - start_offset // 128 + 1 AS n_seqs
         |FROM o""".stripMargin,

    // FULL OUTER on doc_id over the same old/new construction; per-column
    // IS NOT DISTINCT FROM mirrors the null-safe struct compare
    "q_snapshot_diff" ->
      s"""WITH o AS (
         |  SELECT doc_id, text, lang FROM documents WHERE doc_id % 7 <> 0),
         |n AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text,
         |    lang
         |  FROM documents WHERE doc_id % 11 <> 0)
         |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         |  CASE WHEN o.doc_id IS NULL THEN 'added'
         |       WHEN n.doc_id IS NULL THEN 'removed'
         |       WHEN o.text IS NOT DISTINCT FROM n.text
         |        AND o.lang IS NOT DISTINCT FROM n.lang THEN 'unchanged'
         |       ELSE 'changed' END AS status
         |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin,

    "q_scd_merge" -> {
      // per-column latest-wins pick of the full-outer merge
      def pick(c: String) =
        s"""CASE WHEN u.doc_id IS NULL THEN c.$c
           |       WHEN c.doc_id IS NULL THEN u.$c
           |       WHEN u.version >= c.version THEN u.$c
           |       ELSE c.$c END AS $c""".stripMargin
      s"""WITH cur AS (
         |  SELECT doc_id, text, lang, source, n_chars,
         |    CAST(1 AS BIGINT) AS version, FALSE AS deleted
         |  FROM documents),
         |ups AS (
         |  SELECT doc_id, text || ' v2' AS text, lang, source,
         |    n_chars + 3 AS n_chars, CAST(2 AS BIGINT) AS version,
         |    (doc_id % 3 = 0) AS deleted
         |  FROM documents WHERE doc_id % 7 = 0
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars,
         |    CAST(2 AS BIGINT) AS version, FALSE AS deleted
         |  FROM documents WHERE doc_id % 11 = 0),
         |m AS (
         |  SELECT COALESCE(u.doc_id, c.doc_id) AS doc_id,
         |    ${Seq("text", "lang", "source", "n_chars", "version", "deleted").map(pick).mkString(",\n    ")}
         |  FROM cur c FULL JOIN ups u ON c.doc_id = u.doc_id)
         |SELECT * FROM m WHERE NOT deleted""".stripMargin
    },

    // the bloom is a prefilter with no false negatives: output == the
    // plain semi-join, which is what the oracle states (a bit-logic bug
    // would drop rows and fail the hash compare)
    "q_bloom_join" ->
      s"""SELECT e.event_id, e.user_id, e.event_type FROM events e
         |WHERE EXISTS (
         |  SELECT 1 FROM events b
         |  WHERE b.event_type = 'purchase' AND b.value > 90
         |    AND b.user_id = e.user_id)""".stripMargin,

    "q_outliers" ->
      s"""WITH q AS (
         |  SELECT event_type,
         |    quantile_cont(value, 0.25) AS q1,
         |    quantile_cont(value, 0.75) AS q3
         |  FROM events GROUP BY 1)
         |SELECT e.event_id, e.event_type, e.value, q.q1, q.q3,
         |  q.q1 - CAST(1.5 AS DOUBLE) * (q.q3 - q.q1) AS lo,
         |  q.q3 + CAST(1.5 AS DOUBLE) * (q.q3 - q.q1) AS hi,
         |  (e.value < q.q1 - CAST(1.5 AS DOUBLE) * (q.q3 - q.q1)
         |   OR e.value > q.q3 + CAST(1.5 AS DOUBLE) * (q.q3 - q.q1)) AS is_outlier
         |FROM events e JOIN q USING (event_type)""".stripMargin,

    "q_vocabulary" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($tokensSql) AS token FROM documents),
         |agg AS (
         |  SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
         |r AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, token ASC) AS INTEGER) AS rank
         |  FROM agg)
         |SELECT token, tf, df, rank FROM r WHERE rank <= 100""".stripMargin,

    "q_stopwords" ->
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, unnest($tokensSql) AS token FROM documents),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |agg AS (SELECT token, count(*) AS df FROM tok GROUP BY 1)
         |SELECT token, df, CAST(df AS DOUBLE) / t.n_docs AS df_ratio
         |FROM agg, t
         |WHERE CAST(df AS DOUBLE) / t.n_docs >= CAST(0.5 AS DOUBLE)""".stripMargin,

    "q_pair_vocabulary" ->
      s"""WITH tok AS (SELECT doc_id, $tokensSql AS t FROM documents),
         |p AS (
         |  SELECT doc_id,
         |    unnest(list_transform(generate_series(1, len(t) - 1),
         |      i -> t[i] || ' ' || t[i+1])) AS pair
         |  FROM tok),
         |agg AS (
         |  SELECT pair, count(*) AS tf, count(DISTINCT doc_id) AS df FROM p GROUP BY 1),
         |r AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, pair ASC) AS INTEGER) AS rank
         |  FROM agg)
         |SELECT pair, tf, df, rank FROM r WHERE rank <= 100""".stripMargin,

    "q_text_stats" ->
      s"""WITH tok AS (SELECT doc_id, text, $tokensSql AS t FROM documents)
         |SELECT doc_id,
         |  len(text) AS n_chars,
         |  len(t) AS n_tokens,
         |  len(list_distinct(t)) AS n_distinct_tokens,
         |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpeish_tokens,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(t, w -> CAST(len(w) AS BIGINT))), (a, c) -> a + c) AS token_chars,
         |  CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS distinct_ratio,
         |  CAST(len(list_filter(t, w -> w IN (${TextAnalysis.Stopwords.map("'" + _ + "'").mkString(", ")})))
         |    AS DOUBLE) / len(t) AS stopword_ratio,
         |  CAST(len(text) - len(regexp_replace(text, '[a-z]', '', 'g')) AS DOUBLE) / len(text)
         |    AS alpha_ratio
         |FROM tok""".stripMargin,

    "q_lang_id" -> langIdSql,

    "q_lang_confusion" ->
      s"""WITH pred AS ($langIdSql)
         |SELECT d.lang, p.predicted_lang, count(*) AS n_docs
         |FROM documents d JOIN pred p USING (doc_id)
         |GROUP BY 1, 2""".stripMargin,

    "q_quality_score" ->
      s"""$qualityCte
         |SELECT doc_id, quality_score,
         |  CASE WHEN quality_score >= CAST(0.7 AS DOUBLE) THEN 'high'
         |       WHEN quality_score >= CAST(0.4 AS DOUBLE) THEN 'medium'
         |       ELSE 'low' END AS quality_bucket
         |FROM sc""".stripMargin,

    "q_curate" -> {
      val pairsSql = lshPairsSql(shinglesSql("text", 5),
        perms = 64, nBands = 16, rowsPerBand = 4, minJaccard = 0.5, maxBucket = 64,
        source = "passing")
      s"""WITH RECURSIVE q AS ($qualityCte SELECT doc_id, quality_score FROM sc),
         |passing AS (
         |  SELECT d.doc_id, d.text FROM documents d
         |  JOIN q ON q.doc_id = d.doc_id
         |  WHERE q.quality_score >= CAST(0.4 AS DOUBLE)),
         |pairs_q AS ($pairsSql),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs_q
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs_q),
         |reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM passing
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
         |clusters AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a)
         |SELECT d.doc_id, q.quality_score, c.cluster_id,
         |  CASE WHEN q.quality_score < CAST(0.4 AS DOUBLE) THEN FALSE
         |       WHEN d.doc_id = c.cluster_id THEN TRUE
         |       ELSE FALSE END AS keep,
         |  CASE WHEN q.quality_score < CAST(0.4 AS DOUBLE) THEN 'low_quality'
         |       WHEN d.doc_id = c.cluster_id THEN 'kept'
         |       ELSE 'near_duplicate' END AS reason
         |FROM documents d
         |JOIN q ON q.doc_id = d.doc_id
         |LEFT JOIN clusters c ON c.doc_id = d.doc_id""".stripMargin
    },

    "q_text_fingerprint" ->
      s"""WITH g AS (
         |  SELECT doc_id, ${polyHashSql("text")} AS content_hash,
         |    list_transform(${shinglesSql("text", 8)}, s -> ${polyHashSql("s", "ci")}) AS gh
         |  FROM documents)
         |SELECT doc_id, content_hash, list_min(gh) AS min_gram_hash, list_max(gh) AS max_gram_hash
         |FROM g""".stripMargin,

    "q_multimodal_meta" ->
      s"""SELECT doc_id,
         |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
         |       WHEN doc_id % 3 = 1 THEN 'image/jpeg'
         |       ELSE 'video/mp4' END AS media_type,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  upper(substr(hex(encode(text)), 1, 8)) AS magic_hex,
         |  ${polyHashSql("text")} AS checksum
         |FROM documents""".stripMargin,

    "q_multimodal_frames" ->
      s"""WITH p AS (SELECT doc_id, encode(text) AS payload FROM documents),
         |f AS (
         |  SELECT doc_id,
         |    unnest(generate_series(0, (octet_length(payload) - 1) // 1024)) AS frame_idx,
         |    payload
         |  FROM p)
         |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
         |  upper(substr(hex(payload), CAST(frame_idx AS INTEGER) * 2048 + 1, 512)) AS frame_hex
         |FROM f""".stripMargin,

    "q_multimodal_decode" ->
      s"SELECT * FROM read_parquet('$mediaDecodeExpected')",

    "q_media_pixels" ->
      s"SELECT * FROM read_parquet('$mediaPixelExpected')",

    "q_media_phash" ->
      s"SELECT * FROM read_parquet('$mediaPhashExpected')",

    "q_media_afp" ->
      s"SELECT * FROM read_parquet('$mediaAfpExpected')",

    // the q_media_neardup banding over the committed afp mirror (single
    // 64-bit fingerprint; the second hash is identically zero)
    "q_media_afp_pairs" ->
      s"""WITH ph AS (SELECT doc_id, afp AS ahash
         |  FROM read_parquet('$mediaAfpExpected')),
         |banded AS (
         |  SELECT doc_id, ahash, b.band, (ahash >> (8 * b.band)) & 255 AS band_val
         |  FROM ph, (SELECT unnest(generate_series(0, 7)) AS band) b),
         |buckets AS (
         |  SELECT band, band_val,
         |    list(struct_pack(doc_id := doc_id, ahash := ahash)) AS ids
         |  FROM banded GROUP BY 1, 2),
         |pairs AS (
         |  SELECT DISTINCT p.doc_a AS doc_a, p.doc_b AS doc_b, p.hamming AS hamming FROM (
         |    SELECT unnest(flatten(list_transform(ids, x ->
         |      list_transform(list_filter(ids, y -> y > x), y ->
         |        struct_pack(doc_a := x.doc_id, doc_b := y.doc_id,
         |          hamming := CAST(bit_count(xor(x.ahash, y.ahash)) AS INTEGER)))))) AS p
         |    FROM buckets WHERE len(ids) BETWEEN 2 AND 256))
         |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 8""".stripMargin,

    // the q_dedup_simhash banding machinery over the INDEPENDENT
    // committed phash table: (ahash >> 8b) & 255 equals the engine's
    // unsigned shift-and-mask for b <= 7 (low bits agree under either
    // shift), struct comparison orders by doc_id first
    "q_media_neardup" ->
      s"""WITH ph AS (SELECT doc_id, ahash, dhash
         |  FROM read_parquet('$mediaPhashExpected')),
         |banded AS (
         |  SELECT doc_id, ahash, dhash, b.band,
         |    (ahash >> (8 * b.band)) & 255 AS band_val
         |  FROM ph, (SELECT unnest(generate_series(0, 7)) AS band) b),
         |buckets AS (
         |  SELECT band, band_val,
         |    list(struct_pack(doc_id := doc_id, ahash := ahash, dhash := dhash)) AS ids
         |  FROM banded GROUP BY 1, 2),
         |pairs AS (
         |  SELECT DISTINCT p.doc_a AS doc_a, p.doc_b AS doc_b, p.hamming AS hamming FROM (
         |    SELECT unnest(flatten(list_transform(ids, x ->
         |      list_transform(list_filter(ids, y -> y > x), y ->
         |        struct_pack(doc_a := x.doc_id, doc_b := y.doc_id,
         |          hamming := CAST(bit_count(xor(x.ahash, y.ahash))
         |            + bit_count(xor(x.dhash, y.dhash)) AS INTEGER)))))) AS p
         |    FROM buckets WHERE len(ids) BETWEEN 2 AND 256))
         |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 8""".stripMargin,

    "q_media_resize" ->
      s"SELECT * FROM read_parquet('$mediaResizeExpected')",

    "q_multimodal_resize" ->
      s"""WITH p AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 0 THEN 'image/png'
         |         WHEN doc_id % 3 = 1 THEN 'image/jpeg'
         |         ELSE 'video/mp4' END AS media_type,
         |    ${polyHashSql("text")} AS checksum
         |  FROM documents),
         |d AS (
         |  SELECT doc_id, media_type,
         |    CAST(64 + checksum % 512 AS INTEGER) AS width,
         |    CAST(64 + (checksum // 512) % 512 AS INTEGER) AS height
         |  FROM p),
         |s AS (
         |  SELECT *, CASE WHEN greatest(width, height) <= 128 THEN CAST(100 AS BIGINT)
         |                 ELSE 12800 // greatest(width, height) END AS scale_pct
         |  FROM d)
         |SELECT doc_id, media_type, width, height,
         |  CAST((width * scale_pct) // 100 AS INTEGER) AS out_width,
         |  CAST((height * scale_pct) // 100 AS INTEGER) AS out_height
         |FROM s""".stripMargin,

    "q_events_window" ->
      s"""SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
         |  count(*) AS n_events,
         |  count(DISTINCT user_id) AS n_users,
         |  CAST(sum(CAST(round(value * CAST(1000000 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS value_micros,
         |  min(value) AS value_min,
         |  max(value) AS value_max
         |FROM events GROUP BY 1, 2""".stripMargin,

    "q_events_hopping" ->
      s"""WITH e AS (
         |  SELECT epoch_us(ts) AS ts_us, event_type, user_id, value FROM events),
         |w AS (
         |  SELECT unnest(list_transform(generate_series(0, 1),
         |    k -> (ts_us // 1800000000 - k) * 1800000000)) AS window_start_us,
         |    event_type, user_id, value
         |  FROM e)
         |SELECT window_start_us, event_type,
         |  count(*) AS n_events,
         |  count(DISTINCT user_id) AS n_users,
         |  CAST(sum(CAST(round(value * CAST(1000000 AS DOUBLE)) AS BIGINT)) AS BIGINT)
         |    AS value_micros
         |FROM w GROUP BY 1, 2""".stripMargin,

    "q_retention" ->
      s"""WITH e AS (
         |  SELECT DISTINCT user_id, epoch_us(ts) // ${7L * 24 * 3600 * 1000000} AS week
         |  FROM events),
         |first_seen AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1),
         |sizes AS (SELECT cohort_week, count(*) AS cohort_size FROM first_seen GROUP BY 1),
         |grid AS (
         |  SELECT f.cohort_week, e.week - f.cohort_week AS weeks_since,
         |    count(DISTINCT e.user_id) AS n_active
         |  FROM e JOIN first_seen f USING (user_id)
         |  GROUP BY 1, 2)
         |SELECT g.cohort_week, g.weeks_since, g.n_active, s.cohort_size,
         |  CAST(g.n_active AS DOUBLE) / s.cohort_size AS retention
         |FROM grid g JOIN sizes s USING (cohort_week)""".stripMargin,

    "q_funnel" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
         |u AS (SELECT DISTINCT user_id FROM e),
         |s1 AS (
         |  SELECT user_id, min(ts_us) AS t1_us FROM e
         |  WHERE event_type = 'view' GROUP BY 1),
         |s2 AS (
         |  SELECT e.user_id, min(ts_us) AS t2_us FROM e JOIN s1 USING (user_id)
         |  WHERE event_type = 'click' AND ts_us > t1_us GROUP BY 1),
         |s3 AS (
         |  SELECT e.user_id, min(ts_us) AS t3_us FROM e JOIN s2 USING (user_id)
         |  WHERE event_type = 'purchase' AND ts_us > t2_us GROUP BY 1)
         |SELECT u.user_id, s1.t1_us, s2.t2_us, s3.t3_us,
         |  (CASE WHEN s1.t1_us IS NOT NULL THEN 1 ELSE 0 END
         |   + CASE WHEN s2.t2_us IS NOT NULL THEN 1 ELSE 0 END
         |   + CASE WHEN s3.t3_us IS NOT NULL THEN 1 ELSE 0 END) AS stage
         |FROM u
         |LEFT JOIN s1 USING (user_id)
         |LEFT JOIN s2 USING (user_id)
         |LEFT JOIN s3 USING (user_id)""".stripMargin,

    "q_range_join" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
         |iv AS (
         |  SELECT user_id, event_id AS interval_id, ts_us AS start_us,
         |    ts_us + 7200000000 AS end_us
         |  FROM e WHERE event_id % 101 = 0)
         |SELECT e.event_id, e.user_id, e.ts_us, iv.interval_id, iv.start_us, iv.end_us
         |FROM e JOIN iv
         |  ON e.user_id = iv.user_id AND e.ts_us BETWEEN iv.start_us AND iv.end_us""".stripMargin,

    "q_asof_join" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events),
         |r AS (
         |  SELECT user_id, ts_us, max(value) AS rate
         |  FROM e WHERE event_id % 97 = 0 GROUP BY 1, 2)
         |SELECT e.event_id, e.user_id, e.ts_us, e.value, r.rate
         |FROM e ASOF LEFT JOIN r
         |  ON e.user_id = r.user_id AND e.ts_us >= r.ts_us""".stripMargin,

    "q_sessionize" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
         |f AS (
         |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
         |                   OR ts_us - lag(ts_us) OVER w > 1800000000
         |                 THEN 1 ELSE 0 END AS new_session
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         |g AS (
         |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         |  FROM f)
         |SELECT user_id, session_id, count(*) AS n_events,
         |  min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
         |  CAST(sum(CAST(round(value * CAST(1000000 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS value_micros
         |FROM g GROUP BY 1, 2""".stripMargin,

    "q_nb_train" -> lnToleranceEcho("q_nb_train",
      s"""WITH $nbModelCte,
         |expected AS (SELECT label, token, cnt, loglik_micros FROM model)""".stripMargin,
      Seq("label", "token"), Seq("cnt"), "loglik_micros"),

    "q_nb_classify" ->
      s"""WITH $nbModelCte,
         |priors AS (
         |  SELECT label,
         |    CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
         |      AS prior_micros
         |  FROM labels, (SELECT sum(n_docs) AS n FROM labels)),
         |doctok AS (SELECT doc_id, unnest($tokensSql) AS token FROM documents),
         |docsum AS (
         |  SELECT dt.doc_id, m.label, CAST(sum(m.loglik_micros) AS BIGINT) AS s
         |  FROM doctok dt JOIN model m USING (token) GROUP BY 1, 2),
         |scored AS (
         |  SELECT d.doc_id, d.lang, p.label,
         |    p.prior_micros + coalesce(ds.s, 0) AS score
         |  FROM documents d CROSS JOIN priors p
         |  LEFT JOIN docsum ds ON ds.doc_id = d.doc_id AND ds.label = p.label),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |    ORDER BY score DESC, label ASC) AS rn
         |  FROM scored)
         |SELECT doc_id, lang, label AS predicted_label,
         |  CAST(score AS BIGINT) AS score_micros
         |FROM r WHERE rn = 1""".stripMargin,

    "q_semantic_dedup" -> {
      // mirror of Dedup.semantic(k=8, iters=2, tau=0.3): the q_kmeans
      // 2-round Lloyd chain keeping v in the final assignment, then
      // in-cell pairs (a < b) at cosine >= tau, dup_of = min matching a
      s"""WITH $embCte,
         |c0 AS (SELECT vec_id AS cluster, v AS c FROM e WHERE v IS NOT NULL ORDER BY vec_id LIMIT 8),
         |d1 AS (
         |  SELECT e.vec_id, e.v, c0.cluster, ${sqDistSql("e.v", "c0.c")} AS dist
         |  FROM e, c0),
         |a1 AS (
         |  SELECT vec_id, v, cluster FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY dist ASC, cluster ASC) AS rn
         |    FROM d1) WHERE rn = 1),
         |u1 AS (
         |  SELECT cluster, g.dim,
         |    CAST(sum(CAST(round(v[g.dim] * 1000000) AS BIGINT)) AS BIGINT) AS s,
         |    count(*) AS n
         |  FROM a1, (SELECT unnest(generate_series(1, 64)) AS dim) g
         |  GROUP BY 1, 2),
         |c1 AS (
         |  SELECT cluster, list(CAST(s AS DOUBLE) / (n * 1000000) ORDER BY dim) AS c
         |  FROM u1 GROUP BY 1),
         |d2 AS (
         |  SELECT e.vec_id, e.v, c1.cluster, ${sqDistSql("e.v", "c1.c")} AS dist
         |  FROM e, c1),
         |a2 AS (
         |  SELECT vec_id, v, cluster FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY dist ASC, cluster ASC) AS rn
         |    FROM d2) WHERE rn = 1),
         |nrm AS (
         |  SELECT vec_id, v, cluster, sqrt(${dotSql("v", "v", 64)}) AS norm FROM a2),
         |p AS (
         |  SELECT x.vec_id AS a, y.vec_id AS b
         |  FROM nrm x JOIN nrm y
         |    ON x.cluster = y.cluster AND x.vec_id < y.vec_id
         |  WHERE x.norm > 0 AND y.norm > 0
         |    AND (${dotSql("x.v", "y.v", 64)} / (x.norm * y.norm)) >= CAST(0.3 AS DOUBLE)),
         |rem AS (SELECT b AS vec_id, min(a) AS dup_of FROM p GROUP BY 1)
         |SELECT a2.vec_id, a2.cluster, rem.dup_of,
         |  (rem.dup_of IS NULL) AS keep
         |FROM a2 LEFT JOIN rem USING (vec_id)""".stripMargin
    },

    "q_heavy_hitters" ->
      // exact mirror valid because the corpus vocabulary fits the sketch
      // capacity (no eviction -> est = true count, err = 0); same
      // (est desc, token asc) ranking tiebreak as the sketch's eval
      s"""WITH tok AS (SELECT unnest($tokensSql) AS token FROM documents),
         |agg AS (SELECT token, count(*) AS est FROM tok GROUP BY 1),
         |r AS (
         |  SELECT token, est,
         |    ROW_NUMBER() OVER (ORDER BY est DESC, token ASC) AS rn
         |  FROM agg)
         |SELECT token, CAST(est AS BIGINT) AS est, CAST(0 AS BIGINT) AS err
         |FROM r WHERE rn <= 16""".stripMargin,

    "q_pq_train" ->
      s"""WITH $embCte,
         |$pqTrainCte
         |SELECT sub, code, dim, c FROM pqfinal""".stripMargin,

    "q_pq_search" ->
      s"""WITH $embCte,
         |$pqTrainCte,
         |q AS (SELECT v FROM e WHERE vec_id = (SELECT min(vec_id) FROM e)),
         |qsv AS (SELECT s.sub, q.v[s.sub*32+1:(s.sub+1)*32] AS qv
         |  FROM pqsubs s, q),
         |qt AS (SELECT fc.sub, fc.code,
         |    CAST(round(1000000 * ${sq32Sql("qsv.qv", "fc.c")}) AS BIGINT) AS t
         |  FROM pqfc fc JOIN qsv ON qsv.sub = fc.sub),
         |pqd2 AS (SELECT sv.vec_id, sv.sub, fc.code, ${sq32Sql("sv.sv", "fc.c")} AS dist
         |  FROM pqsv sv JOIN pqfc fc ON fc.sub = sv.sub),
         |pqa2 AS (SELECT vec_id, sub, code FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
         |    ORDER BY dist ASC, code ASC) AS rn FROM pqd2) WHERE rn = 1),
         |scores AS (SELECT a.vec_id, CAST(SUM(qt.t) AS BIGINT) AS dist_micros
         |  FROM pqa2 a JOIN qt ON qt.sub = a.sub AND qt.code = a.code
         |  GROUP BY 1)
         |SELECT vec_id, dist_micros FROM scores
         |ORDER BY dist_micros ASC, vec_id ASC LIMIT 10""".stripMargin,

    "q_ann_ivfpq" ->
      s"""WITH $embCte,
         |${pqCte("cg", "e", 1, 64, 4)},
         |cgd AS (SELECT sv.vec_id, c.code, ${sqNSql(64, "sv.sv", "c.c")} AS dist
         |  FROM cgsv sv JOIN cgfc c ON c.sub = sv.sub),
         |asg AS (SELECT vec_id, code AS cell FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY dist ASC, code ASC) AS rn FROM cgd) WHERE rn = 1),
         |e2 AS (SELECT e.vec_id,
         |    list_transform(generate_series(1, 64), j -> e.v[j] - fc.c[j]) AS v
         |  FROM e JOIN asg ON asg.vec_id = e.vec_id
         |  JOIN cgfc fc ON fc.code = asg.cell AND fc.sub = 0
         |  WHERE e.v IS NOT NULL),
         |${pqCte("pq", "e2", 2, 32, 4)},
         |pqd2 AS (SELECT sv.vec_id, sv.sub, fc.code, ${sq32Sql("sv.sv", "fc.c")} AS dist
         |  FROM pqsv sv JOIN pqfc fc ON fc.sub = sv.sub),
         |enc AS (SELECT vec_id, sub, code FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
         |    ORDER BY dist ASC, code ASC) AS rn FROM pqd2) WHERE rn = 1),
         |q AS (SELECT v FROM e WHERE vec_id = (SELECT min(vec_id) FROM e)),
         |qprobe AS (SELECT fc.code AS cell,
         |    CAST(round(1000000 * ${sqNSql(64, "q.v", "fc.c")}) AS BIGINT) AS d
         |  FROM cgfc fc, q ORDER BY d ASC, cell ASC LIMIT 2),
         |qres AS (SELECT p.cell,
         |    list_transform(generate_series(1, 64), j -> q.v[j] - fc.c[j]) AS qv
         |  FROM qprobe p JOIN cgfc fc ON fc.code = p.cell AND fc.sub = 0, q),
         |qsv2 AS (SELECT r.cell, s.sub, r.qv[s.sub*32+1:(s.sub+1)*32] AS qv
         |  FROM qres r, pqsubs s),
         |qt AS (SELECT q2.cell, q2.sub, fc.code,
         |    CAST(round(1000000 * ${sq32Sql("q2.qv", "fc.c")}) AS BIGINT) AS t
         |  FROM qsv2 q2 JOIN pqfc fc ON fc.sub = q2.sub),
         |scores AS (SELECT a.vec_id, a.cell, CAST(SUM(qt.t) AS BIGINT) AS dist_micros
         |  FROM asg a JOIN enc ON enc.vec_id = a.vec_id
         |  JOIN qt ON qt.cell = a.cell AND qt.sub = enc.sub AND qt.code = enc.code
         |  GROUP BY 1, 2)
         |SELECT vec_id, cell, dist_micros FROM scores
         |ORDER BY dist_micros ASC, vec_id ASC LIMIT 10""".stripMargin,

    // the q_ann_ivfpq machinery with a query SET: probes/residual ADC
    // tables keyed by query_id, scores per (query, vec), rank per query
    "q_ann_ivfpq_batch" ->
      s"""WITH $embCte,
         |${pqCte("cg", "e", 1, 64, 4)},
         |cgd AS (SELECT sv.vec_id, c.code, ${sqNSql(64, "sv.sv", "c.c")} AS dist
         |  FROM cgsv sv JOIN cgfc c ON c.sub = sv.sub),
         |asg AS (SELECT vec_id, code AS cell FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY dist ASC, code ASC) AS rn FROM cgd) WHERE rn = 1),
         |e2 AS (SELECT e.vec_id,
         |    list_transform(generate_series(1, 64), j -> e.v[j] - fc.c[j]) AS v
         |  FROM e JOIN asg ON asg.vec_id = e.vec_id
         |  JOIN cgfc fc ON fc.code = asg.cell AND fc.sub = 0
         |  WHERE e.v IS NOT NULL),
         |${pqCte("pq", "e2", 2, 32, 4)},
         |pqd2 AS (SELECT sv.vec_id, sv.sub, fc.code, ${sq32Sql("sv.sv", "fc.c")} AS dist
         |  FROM pqsv sv JOIN pqfc fc ON fc.sub = sv.sub),
         |enc AS (SELECT vec_id, sub, code FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
         |    ORDER BY dist ASC, code ASC) AS rn FROM pqd2) WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < 4),
         |qprobe AS (SELECT query_id, cell FROM (
         |  SELECT q.query_id, fc.code AS cell,
         |    CAST(round(1000000 * ${sqNSql(64, "q.v", "fc.c")}) AS BIGINT) AS d,
         |    ROW_NUMBER() OVER (PARTITION BY q.query_id
         |      ORDER BY CAST(round(1000000 * ${sqNSql(64, "q.v", "fc.c")}) AS BIGINT) ASC,
         |        fc.code ASC) AS rn
         |  FROM cgfc fc, q) WHERE rn <= 2),
         |qres AS (SELECT p.query_id, p.cell,
         |    list_transform(generate_series(1, 64), j -> q.v[j] - fc.c[j]) AS qv
         |  FROM qprobe p JOIN cgfc fc ON fc.code = p.cell AND fc.sub = 0
         |  JOIN q ON q.query_id = p.query_id),
         |qsv2 AS (SELECT r.query_id, r.cell, s.sub,
         |    r.qv[s.sub*32+1:(s.sub+1)*32] AS qv
         |  FROM qres r, pqsubs s),
         |qt AS (SELECT q2.query_id, q2.cell, q2.sub, fc.code,
         |    CAST(round(1000000 * ${sq32Sql("q2.qv", "fc.c")}) AS BIGINT) AS t
         |  FROM qsv2 q2 JOIN pqfc fc ON fc.sub = q2.sub),
         |scores AS (SELECT qt.query_id, a.vec_id, a.cell,
         |    CAST(SUM(qt.t) AS BIGINT) AS dist_micros
         |  FROM asg a JOIN enc ON enc.vec_id = a.vec_id
         |  JOIN qt ON qt.cell = a.cell AND qt.sub = enc.sub AND qt.code = enc.code
         |  GROUP BY 1, 2, 3)
         |SELECT query_id, vec_id, cell, dist_micros, rank FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY dist_micros ASC, vec_id ASC) AS INTEGER) AS rank
         |  FROM scores)
         |WHERE rank <= 10""".stripMargin,

    // the batch machinery with the ADAPTIVE probe rule: cells ranked per
    // query by (micros-dist, cell), probed while the cells ranked BEFORE
    // hold < 150 candidates (exclusive cumulative occupancy), capped at 3
    "q_ann_adaptive" ->
      s"""WITH $embCte,
         |${pqCte("cg", "e", 1, 64, 4)},
         |cgd AS (SELECT sv.vec_id, c.code, ${sqNSql(64, "sv.sv", "c.c")} AS dist
         |  FROM cgsv sv JOIN cgfc c ON c.sub = sv.sub),
         |asg AS (SELECT vec_id, code AS cell FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY dist ASC, code ASC) AS rn FROM cgd) WHERE rn = 1),
         |e2 AS (SELECT e.vec_id,
         |    list_transform(generate_series(1, 64), j -> e.v[j] - fc.c[j]) AS v
         |  FROM e JOIN asg ON asg.vec_id = e.vec_id
         |  JOIN cgfc fc ON fc.code = asg.cell AND fc.sub = 0
         |  WHERE e.v IS NOT NULL),
         |${pqCte("pq", "e2", 2, 32, 4)},
         |pqd2 AS (SELECT sv.vec_id, sv.sub, fc.code, ${sq32Sql("sv.sv", "fc.c")} AS dist
         |  FROM pqsv sv JOIN pqfc fc ON fc.sub = sv.sub),
         |enc AS (SELECT vec_id, sub, code FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
         |    ORDER BY dist ASC, code ASC) AS rn FROM pqd2) WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < 4),
         |cellsz AS (SELECT cell, CAST(count(*) AS BIGINT) AS sz FROM asg GROUP BY 1),
         |qrank AS (
         |  SELECT q.query_id, fc.code AS cell,
         |    ROW_NUMBER() OVER (PARTITION BY q.query_id
         |      ORDER BY CAST(round(1000000 * ${sqNSql(64, "q.v", "fc.c")}) AS BIGINT) ASC,
         |        fc.code ASC) AS rn
         |  FROM cgfc fc, q),
         |qprobe AS (SELECT query_id, cell FROM (
         |  SELECT r.query_id, r.cell, r.rn,
         |    SUM(coalesce(z.sz, 0)) OVER (PARTITION BY r.query_id ORDER BY r.rn
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
         |  FROM qrank r LEFT JOIN cellsz z ON z.cell = r.cell)
         |  WHERE rn <= 3 AND coalesce(prev, 0) < 150),
         |qres AS (SELECT p.query_id, p.cell,
         |    list_transform(generate_series(1, 64), j -> q.v[j] - fc.c[j]) AS qv
         |  FROM qprobe p JOIN cgfc fc ON fc.code = p.cell AND fc.sub = 0
         |  JOIN q ON q.query_id = p.query_id),
         |qsv2 AS (SELECT r.query_id, r.cell, s.sub,
         |    r.qv[s.sub*32+1:(s.sub+1)*32] AS qv
         |  FROM qres r, pqsubs s),
         |qt AS (SELECT q2.query_id, q2.cell, q2.sub, fc.code,
         |    CAST(round(1000000 * ${sq32Sql("q2.qv", "fc.c")}) AS BIGINT) AS t
         |  FROM qsv2 q2 JOIN pqfc fc ON fc.sub = q2.sub),
         |scores AS (SELECT qt.query_id, a.vec_id, a.cell,
         |    CAST(SUM(qt.t) AS BIGINT) AS dist_micros
         |  FROM asg a JOIN enc ON enc.vec_id = a.vec_id
         |  JOIN qt ON qt.cell = a.cell AND qt.sub = enc.sub AND qt.code = enc.code
         |  GROUP BY 1, 2, 3)
         |SELECT query_id, vec_id, cell, dist_micros, rank FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY dist_micros ASC, vec_id ASC) AS INTEGER) AS rank
         |  FROM scores)
         |WHERE rank <= 10""".stripMargin,

    // the batch chain above cut at 10 ADC candidates, then the exact
    // float re-rank: micros-quantized squared L2 in the kernel's fold
    // order, final top-5 by (dist asc, vec_id asc)
    "q_ann_ivfpq_rerank" ->
      s"""WITH $embCte,
         |${pqCte("cg", "e", 1, 64, 4)},
         |cgd AS (SELECT sv.vec_id, c.code, ${sqNSql(64, "sv.sv", "c.c")} AS dist
         |  FROM cgsv sv JOIN cgfc c ON c.sub = sv.sub),
         |asg AS (SELECT vec_id, code AS cell FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY dist ASC, code ASC) AS rn FROM cgd) WHERE rn = 1),
         |e2 AS (SELECT e.vec_id,
         |    list_transform(generate_series(1, 64), j -> e.v[j] - fc.c[j]) AS v
         |  FROM e JOIN asg ON asg.vec_id = e.vec_id
         |  JOIN cgfc fc ON fc.code = asg.cell AND fc.sub = 0
         |  WHERE e.v IS NOT NULL),
         |${pqCte("pq", "e2", 2, 32, 4)},
         |pqd2 AS (SELECT sv.vec_id, sv.sub, fc.code, ${sq32Sql("sv.sv", "fc.c")} AS dist
         |  FROM pqsv sv JOIN pqfc fc ON fc.sub = sv.sub),
         |enc AS (SELECT vec_id, sub, code FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
         |    ORDER BY dist ASC, code ASC) AS rn FROM pqd2) WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < 4),
         |qprobe AS (SELECT query_id, cell FROM (
         |  SELECT q.query_id, fc.code AS cell,
         |    ROW_NUMBER() OVER (PARTITION BY q.query_id
         |      ORDER BY CAST(round(1000000 * ${sqNSql(64, "q.v", "fc.c")}) AS BIGINT) ASC,
         |        fc.code ASC) AS rn
         |  FROM cgfc fc, q) WHERE rn <= 2),
         |qres AS (SELECT p.query_id, p.cell,
         |    list_transform(generate_series(1, 64), j -> q.v[j] - fc.c[j]) AS qv
         |  FROM qprobe p JOIN cgfc fc ON fc.code = p.cell AND fc.sub = 0
         |  JOIN q ON q.query_id = p.query_id),
         |qsv2 AS (SELECT r.query_id, r.cell, s.sub,
         |    r.qv[s.sub*32+1:(s.sub+1)*32] AS qv
         |  FROM qres r, pqsubs s),
         |qt AS (SELECT q2.query_id, q2.cell, q2.sub, fc.code,
         |    CAST(round(1000000 * ${sq32Sql("q2.qv", "fc.c")}) AS BIGINT) AS t
         |  FROM qsv2 q2 JOIN pqfc fc ON fc.sub = q2.sub),
         |scores AS (SELECT qt.query_id, a.vec_id, a.cell,
         |    CAST(SUM(qt.t) AS BIGINT) AS dist_micros
         |  FROM asg a JOIN enc ON enc.vec_id = a.vec_id
         |  JOIN qt ON qt.cell = a.cell AND qt.sub = enc.sub AND qt.code = enc.code
         |  GROUP BY 1, 2, 3),
         |cand AS (SELECT query_id, vec_id FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY dist_micros ASC, vec_id ASC) AS rank
         |  FROM scores) WHERE rank <= 10),
         |rr AS (SELECT c.query_id, c.vec_id,
         |    CAST(round(1000000 * ${sqNSql(64, "q.v", "ev.v")}) AS BIGINT)
         |      AS dist_sq_micros
         |  FROM cand c
         |  JOIN e ev ON ev.vec_id = c.vec_id
         |  JOIN q ON q.query_id = c.query_id)
         |SELECT query_id, vec_id, dist_sq_micros, rank FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY dist_sq_micros ASC, vec_id ASC) AS INTEGER) AS rank
         |  FROM rr)
         |WHERE rank <= 5""".stripMargin,

    // invariant oracle (DuckDB has no eigensolver): recompute the
    // micros-quantized moment sums TO THE BIT in HUGEINT, rebuild the
    // covariance with the driver's exact double formula, then assert
    // against the dumped model: eigen equation C·v = λ·v (residual
    // covers only Jacobi convergence), orthonormality, exact mean
    // equality, descending non-negative eigenvalues, and shape. All
    // checks pass -> emit got verbatim (hash-equal); any failure ->
    // zero rows -> red.
    "q_pca_train" -> pcaTrainOracle("q_pca_train"),

    // q_pca_train's oracle VERBATIM against the drop-state-merged model —
    // the strongest possible check of the state/merge algebra (the
    // q_profile_incr pattern): the merged model must satisfy the same
    // eigen/orthonormality/mean invariants against the same HUGEINT
    // moment recomputation over the FULL corpus
    "q_pca_incr" -> pcaTrainOracle("q_pca_incr"),

    "q_pca_project" ->
      // exact-hash: the projection folds the SAME dumped model values in
      // the same ascending-dim order as the Spark aggregate (model
      // recomputation is bit-reproducible: exact integer moments +
      // deterministic Jacobi)
      s"""WITH m AS (
         |  SELECT comp, list(loading ORDER BY dim) AS lv
         |  FROM read_parquet('__VERIFY_OUT__/q_pca_train/*.parquet')
         |  WHERE comp >= 0 GROUP BY 1),
         |mu AS (
         |  SELECT list(loading ORDER BY dim) AS lm
         |  FROM read_parquet('__VERIFY_OUT__/q_pca_train/*.parquet')
         |  WHERE comp = -1),
         |$embCte
         |SELECT e.vec_id, m.comp,
         |  CAST(round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list_transform(generate_series(1, 64), pi -> (e.v[pi] - mu.lm[pi]) * m.lv[pi])),
         |    (pa, pb) -> pa + pb) * 1000000) AS BIGINT) AS proj_micros
         |FROM e, m, mu""".stripMargin,

    "q_pca_whiten" ->
      // q_pca_project's fold, then per-component 1/sqrt(eigval) scaling
      // of the ROUNDED micros (exactly Spark's op order); eigval-floor
      // components drop. sqrt/division are IEEE-correctly-rounded in
      // both engines, so the scale factors match the baked literals bit
      // for bit.
      s"""WITH m AS (
         |  SELECT comp, list(loading ORDER BY dim) AS lv, min(eigval) AS eigval
         |  FROM read_parquet('__VERIFY_OUT__/q_pca_train/*.parquet')
         |  WHERE comp >= 0 GROUP BY 1),
         |mu AS (
         |  SELECT list(loading ORDER BY dim) AS lm
         |  FROM read_parquet('__VERIFY_OUT__/q_pca_train/*.parquet')
         |  WHERE comp = -1),
         |$embCte,
         |p AS (
         |  SELECT e.vec_id, m.comp, m.eigval,
         |    CAST(round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |        list_transform(generate_series(1, 64), pi -> (e.v[pi] - mu.lm[pi]) * m.lv[pi])),
         |      (pa, pb) -> pa + pb) * 1000000) AS BIGINT) AS pm
         |  FROM e, m, mu)
         |SELECT vec_id, comp,
         |  CAST(round(((CAST(pm AS DOUBLE) / 1000000)
         |    * (CAST(1 AS DOUBLE) / sqrt(eigval))) * 1000000) AS BIGINT) AS white_micros
         |FROM p WHERE eigval > CAST(0.000000000001 AS DOUBLE)""".stripMargin,

    "q_curate_v2" ->
      // all five gate oracles composed into ONE exact verdict: the
      // nb/lm/quality/exact/cluster CTE chains are the same proven
      // mirrors their standalone queries use (CTE names disjoint by
      // construction; lshPairsSql's internals scope inside pairs_q)
      s"""WITH RECURSIVE $nbModelCte,
         |priors AS (
         |  SELECT label,
         |    CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
         |      AS prior_micros
         |  FROM labels, (SELECT sum(n_docs) AS n FROM labels)),
         |doctok AS (SELECT doc_id, unnest($tokensSql) AS token FROM documents),
         |docsum AS (
         |  SELECT dt.doc_id, m.label, CAST(sum(m.loglik_micros) AS BIGINT) AS s
         |  FROM doctok dt JOIN model m USING (token) GROUP BY 1, 2),
         |scored AS (
         |  SELECT d.doc_id, p.label, p.prior_micros + coalesce(ds.s, 0) AS score
         |  FROM documents d CROSS JOIN priors p
         |  LEFT JOIN docsum ds ON ds.doc_id = d.doc_id AND ds.label = p.label),
         |rnb AS (
         |  SELECT doc_id, label AS predicted_label FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, label ASC) AS rn FROM scored) WHERE rn = 1),
         |$lmCte,
         |sp AS (
         |  SELECT lbp.doc_id,
         |    u1.fallback_micros AS f1, u2.token AS tok2, bi.loglik_micros AS b
         |  FROM lbp
         |  LEFT JOIN luni u1 ON lbp.t[lbp.x] = u1.token
         |  LEFT JOIN luni u2 ON lbp.t[lbp.x + 1] = u2.token
         |  LEFT JOIN lbi bi ON bi.t1 = lbp.t[lbp.x] AND bi.t2 = lbp.t[lbp.x + 1]),
         |sagg AS (
         |  SELECT doc_id,
         |    CAST(count(*) FILTER (WHERE f1 IS NOT NULL AND tok2 IS NOT NULL) AS BIGINT)
         |      AS n_pairs,
         |    CAST(coalesce(sum(coalesce(b, f1))
         |      FILTER (WHERE f1 IS NOT NULL AND tok2 IS NOT NULL), 0) AS BIGINT)
         |      AS lp_micros
         |  FROM sp GROUP BY 1),
         |${qualityCte.stripPrefix("WITH ")},
         |ex AS (
         |  SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
         |  FROM documents),
         |pairs_q AS (
         |${lshPairsSql(shinglesSql("text", 5),
              perms = 64, nBands = 16, rowsPerBand = 4, minJaccard = 0.5, maxBucket = 64)}),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs_q
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs_q),
         |reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
         |clus AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
         |verdict AS (
         |  SELECT d.doc_id,
         |    CASE WHEN d.doc_id <> ex.keep_id THEN 'exact_dup'
         |         WHEN sc.quality_score < CAST(0.4 AS DOUBLE) THEN 'low_quality'
         |         WHEN rnb.predicted_label NOT IN ('en', 'de', 'fr') THEN 'off_label'
         |         WHEN coalesce(sg.lp_micros, 0) < -3450000 * coalesce(sg.n_pairs, 0)
         |           THEN 'low_lp'
         |         WHEN d.doc_id <> clus.cluster_id THEN 'near_duplicate'
         |         ELSE 'kept' END AS reason
         |  FROM documents d
         |  JOIN ex USING (doc_id)
         |  JOIN sc USING (doc_id)
         |  JOIN rnb USING (doc_id)
         |  LEFT JOIN sagg sg USING (doc_id)
         |  JOIN clus USING (doc_id))
         |SELECT doc_id, (reason = 'kept') AS keep, reason FROM verdict""".stripMargin,

    "q_curate_v3" ->
      // the SEVEN-gate verdict: q_curate_v2's five proven chains plus the
      // q_domain_cap admission (urlParseCte + the hash-priority window)
      // and the q_decontaminate ratio (renamed dcg/dcb/dctot/dcm, riding
      // the quality chain's token lists)
      s"""WITH RECURSIVE $nbModelCte,
         |priors AS (
         |  SELECT label,
         |    CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
         |      AS prior_micros
         |  FROM labels, (SELECT sum(n_docs) AS n FROM labels)),
         |doctok AS (SELECT doc_id, unnest($tokensSql) AS token FROM documents),
         |docsum AS (
         |  SELECT dt.doc_id, m.label, CAST(sum(m.loglik_micros) AS BIGINT) AS s
         |  FROM doctok dt JOIN model m USING (token) GROUP BY 1, 2),
         |scored AS (
         |  SELECT d.doc_id, p.label, p.prior_micros + coalesce(ds.s, 0) AS score
         |  FROM documents d CROSS JOIN priors p
         |  LEFT JOIN docsum ds ON ds.doc_id = d.doc_id AND ds.label = p.label),
         |rnb AS (
         |  SELECT doc_id, label AS predicted_label FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, label ASC) AS rn FROM scored) WHERE rn = 1),
         |$lmCte,
         |sp AS (
         |  SELECT lbp.doc_id,
         |    u1.fallback_micros AS f1, u2.token AS tok2, bi.loglik_micros AS b
         |  FROM lbp
         |  LEFT JOIN luni u1 ON lbp.t[lbp.x] = u1.token
         |  LEFT JOIN luni u2 ON lbp.t[lbp.x + 1] = u2.token
         |  LEFT JOIN lbi bi ON bi.t1 = lbp.t[lbp.x] AND bi.t2 = lbp.t[lbp.x + 1]),
         |sagg AS (
         |  SELECT doc_id,
         |    CAST(count(*) FILTER (WHERE f1 IS NOT NULL AND tok2 IS NOT NULL) AS BIGINT)
         |      AS n_pairs,
         |    CAST(coalesce(sum(coalesce(b, f1))
         |      FILTER (WHERE f1 IS NOT NULL AND tok2 IS NOT NULL), 0) AS BIGINT)
         |      AS lp_micros
         |  FROM sp GROUP BY 1),
         |${qualityCte.stripPrefix("WITH ")},
         |ex AS (
         |  SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
         |  FROM documents),
         |pairs_q AS (
         |${lshPairsSql(shinglesSql("text", 5),
              perms = 64, nBands = 16, rowsPerBand = 4, minJaccard = 0.5, maxBucket = 64)}),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs_q
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs_q),
         |reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
         |clus AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
         |${urlParseCte.stripPrefix("WITH ")},
         |dcap AS (
         |  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY domain
         |    ORDER BY ((doc_id * 1000003 + 17) % $P) % 100 ASC,
         |             doc_id ASC) AS rn
         |  FROM parsed WHERE domain IS NOT NULL),
         |incap AS (SELECT doc_id FROM dcap WHERE rn <= 3),
         |dcg AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    list_distinct(list_transform(generate_series(1, len(t) - 2),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])),
         |    gs -> ${polyHashSql("gs", "ci")}))) AS g
         |  FROM tok),
         |dcb AS (SELECT DISTINCT g FROM dcg WHERE doc_id < 50),
         |dctot AS (SELECT doc_id, count(*) AS n_grams FROM dcg GROUP BY 1),
         |dcm AS (SELECT dcg.doc_id, count(*) AS n_matched
         |        FROM dcg JOIN dcb USING (g) GROUP BY 1),
         |verdict AS (
         |  SELECT d.doc_id,
         |    CASE WHEN d.doc_id <> ex.keep_id THEN 'exact_dup'
         |         WHEN ic.doc_id IS NULL THEN 'domain_capped'
         |         WHEN sc.quality_score < CAST(0.4 AS DOUBLE) THEN 'low_quality'
         |         WHEN rnb.predicted_label NOT IN ('en', 'de', 'fr') THEN 'off_label'
         |         WHEN coalesce(sg.lp_micros, 0) < -3450000 * coalesce(sg.n_pairs, 0)
         |           THEN 'low_lp'
         |         WHEN (CASE WHEN COALESCE(dctot.n_grams, 0) = 0 THEN CAST(0 AS DOUBLE)
         |               ELSE CAST(COALESCE(dcm.n_matched, 0) AS DOUBLE) / dctot.n_grams END)
         |           >= CAST(0.2 AS DOUBLE) THEN 'contaminated'
         |         WHEN d.doc_id <> clus.cluster_id THEN 'near_duplicate'
         |         ELSE 'kept' END AS reason
         |  FROM documents d
         |  JOIN ex USING (doc_id)
         |  JOIN sc USING (doc_id)
         |  JOIN rnb USING (doc_id)
         |  LEFT JOIN sagg sg USING (doc_id)
         |  LEFT JOIN incap ic USING (doc_id)
         |  LEFT JOIN dctot USING (doc_id)
         |  LEFT JOIN dcm USING (doc_id)
         |  JOIN clus USING (doc_id))
         |SELECT doc_id, (reason = 'kept') AS keep, reason FROM verdict""".stripMargin,

    "q_kmeans_text" -> {
      // the q_kmeans 2-round unrolled Lloyd chain over feature-hashed
      // 16-dim text vectors (e = HashingTF mirror: count per hash%16
      // bucket, counts as doubles)
      def d16(v: String, c: String) =
        s"list_reduce(list_transform(generate_series(1, 16), di -> ($v[di] - $c[di]) * ($v[di] - $c[di])), (x, y) -> x + y)"
      s"""WITH e AS (
         |  SELECT doc_id AS vec_id,
         |    list_transform(generate_series(0, 15), fb ->
         |      CAST(len(list_filter(
         |        list_transform($tokensSql, tk -> ${polyHashSql("tk", "ci")}),
         |        hb -> hb % 16 = fb)) AS DOUBLE)) AS v
         |  FROM documents),
         |c0 AS (SELECT vec_id AS cluster, v AS c FROM e WHERE v IS NOT NULL ORDER BY vec_id LIMIT 4),
         |d1 AS (
         |  SELECT e.vec_id, e.v, c0.cluster, ${d16("e.v", "c0.c")} AS dist
         |  FROM e, c0),
         |a1 AS (
         |  SELECT vec_id, v, cluster FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY dist ASC, cluster ASC) AS rn
         |    FROM d1) WHERE rn = 1),
         |u1 AS (
         |  SELECT cluster, g.dim,
         |    CAST(sum(CAST(round(v[g.dim] * 1000000) AS BIGINT)) AS BIGINT) AS s,
         |    count(*) AS n
         |  FROM a1, (SELECT unnest(generate_series(1, 16)) AS dim) g
         |  GROUP BY 1, 2),
         |c1 AS (
         |  SELECT cluster, list(CAST(s AS DOUBLE) / (n * 1000000) ORDER BY dim) AS c
         |  FROM u1 GROUP BY 1),
         |d2 AS (
         |  SELECT e.vec_id, c1.cluster, ${d16("e.v", "c1.c")} AS dist
         |  FROM e, c1)
         |SELECT vec_id, cluster, CAST(round(dist * 1000000) AS BIGINT) AS dist_micros
         |FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY dist ASC, cluster ASC) AS rn
         |  FROM d2) WHERE rn = 1""".stripMargin
    },

    "q_lm_train" -> lnToleranceEcho("q_lm_train",
      s"""WITH $lmCte,
         |expected AS (SELECT t1, t2, cnt, loglik_micros FROM lbi)""".stripMargin,
      Seq("t1", "t2"), Seq("cnt"), "loglik_micros"),

    // mirror of Collocations.pmi (vocabSize=64, minCount=2): the lmCte
    // already builds the unigram counts (lu), top-64 vocab (lv) and
    // adjacent-pair counts (lbg); totals reduce from those tables and the
    // PMI fold matches the Scala left-associated double arithmetic
    "q_collocations" -> lnToleranceEcho("q_collocations",
      s"""WITH $lmCte,
         |ctt AS (SELECT CAST(sum(cnt) AS BIGINT) AS t_total FROM lu),
         |cpt AS (SELECT CAST(sum(cnt) AS BIGINT) AS p_total FROM lbg),
         |expected AS (
         |  SELECT b.t1, b.t2, b.cnt, v1.cnt AS c1, v2.cnt AS c2,
         |    CAST(round(ln(
         |      (CAST(b.cnt AS DOUBLE) * t_total * t_total) /
         |        (CAST(p_total AS DOUBLE) * v1.cnt * v2.cnt)) * 1000000) AS BIGINT)
         |      AS pmi_micros
         |  FROM lbg b
         |  JOIN lv v1 ON b.t1 = v1.token
         |  JOIN lv v2 ON b.t2 = v2.token, ctt, cpt
         |  WHERE b.cnt >= 2)""".stripMargin,
      Seq("t1", "t2"), Seq("cnt", "c1", "c2"), "pmi_micros"),

    // mirror of Collocations.mergePhrases over the positive-PMI phrase
    // table: the q_collocations chain filtered to pmi > 0, collapsed to
    // a chr(1)-joined phrase list, applied per doc by the bpeApplySql
    // list-of-lists fold generalized to set membership
    "q_phrase_merge" ->
      s"""WITH $lmCte,
         |ctt AS (SELECT CAST(sum(cnt) AS BIGINT) AS t_total FROM lu),
         |cpt AS (SELECT CAST(sum(cnt) AS BIGINT) AS p_total FROM lbg),
         |ph AS (
         |  SELECT b.t1 || chr(1) || b.t2 AS p
         |  FROM lbg b
         |  JOIN lv v1 ON b.t1 = v1.token
         |  JOIN lv v2 ON b.t2 = v2.token, ctt, cpt
         |  WHERE b.cnt >= 2 AND
         |    CAST(round(ln(
         |      (CAST(b.cnt AS DOUBLE) * t_total * t_total) /
         |        (CAST(p_total AS DOUBLE) * v1.cnt * v2.cnt)) * 1000000)
         |      AS BIGINT) > 0),
         |plc AS (SELECT coalesce(list(p), CAST([] AS VARCHAR[])) AS pl FROM ph),
         |pdt AS (SELECT doc_id,
         |  CASE WHEN text IS NULL THEN NULL ELSE $tokensSql END AS t
         |  FROM documents),
         |pf AS (
         |  SELECT doc_id, t,
         |    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
         |        list_transform(t, sm -> [sm])),
         |      (accm, xm) -> CASE
         |        WHEN len(accm) = 0 THEN [xm[1]]
         |        WHEN NOT contains(accm[-1], chr(1))
         |          AND list_contains(pl, accm[-1] || chr(1) || xm[1])
         |        THEN list_append(accm[1:len(accm)-1], accm[-1] || chr(1) || xm[1])
         |        ELSE list_append(accm, xm[1]) END) AS m
         |  FROM pdt, plc)
         |SELECT doc_id,
         |  CASE WHEN t IS NULL THEN 0 ELSE CAST(len(t) AS BIGINT) END AS n_tokens,
         |  CASE WHEN t IS NULL THEN 0 ELSE CAST(len(m) AS BIGINT) END AS n_after,
         |  CASE WHEN t IS NULL THEN ''
         |       ELSE array_to_string(list_transform(m, ym ->
         |         replace(ym, chr(1), '_')), ' ') END AS text_merged
         |FROM pf""".stripMargin,

    "q_lm_score" ->
      // every adjacent pair with both sides in vocab scores
      // coalesce(observed bigram, left token's fallback); docs with no
      // scorable pair keep a (0, 0) row via the left join
      s"""WITH $lmCte,
         |sp AS (
         |  SELECT lbp.doc_id,
         |    u1.fallback_micros AS f1, u2.token AS tok2, bi.loglik_micros AS b
         |  FROM lbp
         |  LEFT JOIN luni u1 ON lbp.t[lbp.x] = u1.token
         |  LEFT JOIN luni u2 ON lbp.t[lbp.x + 1] = u2.token
         |  LEFT JOIN lbi bi ON bi.t1 = lbp.t[lbp.x] AND bi.t2 = lbp.t[lbp.x + 1]),
         |sagg AS (
         |  SELECT doc_id,
         |    CAST(count(*) FILTER (WHERE f1 IS NOT NULL AND tok2 IS NOT NULL) AS BIGINT)
         |      AS n_pairs,
         |    CAST(coalesce(sum(coalesce(b, f1))
         |      FILTER (WHERE f1 IS NOT NULL AND tok2 IS NOT NULL), 0) AS BIGINT)
         |      AS lp_micros
         |  FROM sp GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(s.n_pairs, 0) AS n_pairs,
         |  coalesce(s.lp_micros, 0) AS lp_micros
         |FROM documents d LEFT JOIN sagg s USING (doc_id)""".stripMargin,

    // the q_lm_score chain extended by per-lang tercile cutoffs
    // (quantile_cont rounded to micros — the pinned percentile mirror)
    // and integer threshold bucketing
    "q_ccnet_buckets" ->
      s"""WITH $lmCte,
         |sp AS (
         |  SELECT lbp.doc_id,
         |    u1.fallback_micros AS f1, u2.token AS tok2, bi.loglik_micros AS b
         |  FROM lbp
         |  LEFT JOIN luni u1 ON lbp.t[lbp.x] = u1.token
         |  LEFT JOIN luni u2 ON lbp.t[lbp.x + 1] = u2.token
         |  LEFT JOIN lbi bi ON bi.t1 = lbp.t[lbp.x] AND bi.t2 = lbp.t[lbp.x + 1]),
         |sagg AS (
         |  SELECT doc_id,
         |    CAST(count(*) FILTER (WHERE f1 IS NOT NULL AND tok2 IS NOT NULL) AS BIGINT)
         |      AS n_pairs,
         |    CAST(coalesce(sum(coalesce(b, f1))
         |      FILTER (WHERE f1 IS NOT NULL AND tok2 IS NOT NULL), 0) AS BIGINT)
         |      AS lp_micros
         |  FROM sp GROUP BY 1),
         |sc AS (
         |  SELECT d.doc_id, d.lang,
         |    coalesce(s.n_pairs, 0) AS n_pairs,
         |    coalesce(s.lp_micros, 0) AS lp_micros
         |  FROM documents d LEFT JOIN sagg s USING (doc_id)),
         |r AS (
         |  SELECT *, CASE WHEN n_pairs = 0 THEN NULL
         |    ELSE CAST(round(1000000 * CAST(lp_micros AS DOUBLE) / n_pairs) AS BIGINT)
         |    END AS tok_lp_micros FROM sc),
         |cq AS (
         |  SELECT lang,
         |    CAST(round(quantile_cont(tok_lp_micros, CAST(1 AS DOUBLE) / 3)) AS BIGINT) AS c_lo,
         |    CAST(round(quantile_cont(tok_lp_micros, CAST(2 AS DOUBLE) / 3)) AS BIGINT) AS c_hi
         |  FROM r GROUP BY 1)
         |SELECT r.doc_id, r.lang, r.n_pairs, r.lp_micros, r.tok_lp_micros,
         |  CASE WHEN r.tok_lp_micros IS NULL THEN 'tail'
         |       WHEN r.tok_lp_micros >= cq.c_hi THEN 'head'
         |       WHEN r.tok_lp_micros >= cq.c_lo THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM r JOIN cq USING (lang)""".stripMargin,

    "q_bpe_train" -> {
      val union = (1 to BpeMerges).map(i =>
        s"SELECT CAST($i AS INTEGER) AS rank, l, r FROM b$i").mkString("\n  UNION ALL ")
      s"""WITH ${bpeCte(BpeMerges, 1000)}
         |SELECT rank, l AS lhs, r AS rhs, l || r AS merged FROM (
         |  $union)
         |WHERE l <> chr(2)""".stripMargin
    },

    "q_bpe_encode" -> {
      // every distinct word encodes ONCE through the nested rank-order
      // merge folds, docs re-join by word, token lists concatenate in
      // word order, and the sequence folds to the portable hash
      val sym0 = "list_transform(generate_series(1, len(word)), ce -> substr(word, ce, 1))"
      val nested = (1 to BpeMerges).foldLeft(sym0) { (acc, i) =>
        bpeApplySql(acc, s"m$i.l", s"m$i.r", s"e$i")
      }
      val mergeTables = (1 to BpeMerges).map(i => s"b$i m$i").mkString(", ")
      s"""WITH ${bpeCte(BpeMerges, 1000)},
         |doc0 AS (SELECT doc_id, $tokensSql AS t FROM documents),
         |dt AS (SELECT doc_id, unnest(generate_series(1, len(t))) AS pos, t FROM doc0),
         |dw AS (SELECT doc_id, pos, t[pos] AS word FROM dt),
         |uw AS (SELECT DISTINCT word FROM dw),
         |ue AS (SELECT word, $nested AS toks FROM uw, $mergeTables),
         |enc AS (SELECT dw.doc_id, dw.pos, ue.toks FROM dw JOIN ue USING (word)),
         |agg AS (SELECT doc_id, flatten(list(toks ORDER BY pos)) AS at FROM enc GROUP BY 1)
         |SELECT doc_id, CAST(len(at) AS BIGINT) AS n_tokens,
         |  list_reduce(list_prepend(CAST(${TextHash.Seed} AS BIGINT),
         |    list_transform(at, tk -> ${polyHashSql("tk", "ci")})),
         |    (a, h) -> (a * 31 + h) % $P) AS tokens_hash
         |FROM agg""".stripMargin
    },

    // -------------------------------------------- WARC / WebDataset oracles

    "q_warc_records" ->
      s"""SELECT record_idx, "offset", record_type, record_id, target_uri,
         |  warc_date, content_type, content_length, http_status,
         |  http_content_type, payload_len, payload_md5
         |FROM read_parquet('$warcRecordsExpected')""".stripMargin,

    "q_warc_responses" ->
      s"""SELECT record_idx, target_uri, http_content_type, payload_len,
         |  payload_md5
         |FROM read_parquet('$warcRecordsExpected')
         |WHERE record_type = 'response' AND http_status = 200""".stripMargin,

    "q_warc_text" ->
      s"""SELECT record_idx, target_uri, text
         |FROM read_parquet('$warcTextExpected')""".stripMargin,

    // the round trip must reproduce the source table exactly — DuckDB
    // recomputes the projection from the parquet the shards were built of
    "q_wds_roundtrip" ->
      """SELECT doc_id, LENGTH(text) AS n_chars, MD5(text) AS text_md5
        |FROM documents""".stripMargin,

    // binary members: DuckDB reads the very fixture FILES the Spark side
    // tarred up, so the round-tripped bytes must equal the on-disk bytes
    "q_wds_media" ->
      s"""SELECT
         |  CAST(regexp_extract(filename, 'media_(\\d+)\\.', 1) AS BIGINT) AS doc_id,
         |  regexp_extract(filename, '\\.([a-z0-9]+)$$', 1) AS ext,
         |  CAST(size AS BIGINT) AS n_bytes,
         |  hex(content) AS content_hex
         |FROM read_blob('$mediaFixtureDir/media_*')""".stripMargin,

    // ------------------------------------------------------------ URL oracles

    "q_url_parse" ->
      s"""$urlParseCte
         |SELECT doc_id, url, scheme, host, port, path, qs, frag, canon,
         |  domain
         |FROM parsed""".stripMargin,

    "q_domain_cap" ->
      s"""$urlParseCte,
         |capped AS (
         |  SELECT doc_id, domain,
         |    ROW_NUMBER() OVER (PARTITION BY domain
         |      ORDER BY ((doc_id * 1000003 + 17) % $P) % 100 ASC,
         |               doc_id ASC) AS rn
         |  FROM parsed WHERE domain IS NOT NULL)
         |SELECT doc_id, domain FROM capped WHERE rn <= 3""".stripMargin,

    // GRAFT-CLEAN v1: DuckDB's nfc_normalize (utf8proc) mirrors the JDK
    // Normalizer kernel — two independent conformant UAX #15
    // implementations must agree codepoint for codepoint
    "q_clean_text" -> {
      def lit(s: String) = "'" + s.replace("'", "''") + "'"
      s"""WITH t AS (
         |  SELECT doc_id, text || CASE doc_id % 5
         |    WHEN 0 THEN ${lit(cleanSuffixes(0))}
         |    WHEN 1 THEN ${lit(cleanSuffixes(1))}
         |    WHEN 2 THEN ${lit(cleanSuffixes(2))}
         |    WHEN 3 THEN ${lit(cleanSuffixes(3))}
         |    ELSE '' END AS text
         |  FROM documents),
         |c AS (SELECT doc_id, text,
         |  regexp_replace(nfc_normalize(text),
         |    '[\\x00-\\x08\\x0B-\\x1F\\x7F]', '', 'g') AS clean_text
         |  FROM t)
         |SELECT doc_id, clean_text,
         |  coalesce(clean_text <> text, FALSE) AS changed,
         |  length(clean_text) AS n_clean
         |FROM c""".stripMargin
    },

    // the dup-remove rebuild machinery pointed at the benchmark gram set
    "q_decontam_remove" -> {
      val gram3 = polyHashSql(
        "t[i] || ' ' || t[i+1] || ' ' || t[i+2]", "ci")
      s"""WITH toks AS (
         |  SELECT doc_id, $tokensSql AS t FROM documents),
         |tok AS (
         |  SELECT doc_id,
         |    unnest(list_transform(generate_series(1, len(t)), i -> {tok_idx: i, token: t[i]}),
         |      recursive := true)
         |  FROM toks),
         |g AS (
         |  SELECT doc_id,
         |    CASE WHEN len(t) >= 3 THEN
         |      list_transform(generate_series(1, len(t) - 2), i -> $gram3)
         |    ELSE CAST([] AS BIGINT[]) END AS gh
         |  FROM toks),
         |pos AS (
         |  SELECT doc_id,
         |    unnest(list_transform(generate_series(1, len(gh)), i -> {pos: i, gram: gh[i]}),
         |      recursive := true)
         |  FROM g),
         |bench AS (SELECT DISTINCT unnest(gh) AS gram FROM g WHERE doc_id < 50),
         |drop_set AS (
         |  SELECT DISTINCT doc_id, tok_idx FROM (
         |    SELECT p.doc_id, unnest(generate_series(p.pos, p.pos + 2)) AS tok_idx
         |    FROM pos p SEMI JOIN bench b USING (gram))),
         |kept AS (
         |  SELECT k.doc_id, k.tok_idx, k.token
         |  FROM tok k ANTI JOIN drop_set d USING (doc_id, tok_idx)),
         |rebuilt AS (
         |  SELECT doc_id, count(*) AS kept_tokens,
         |    string_agg(token, ' ' ORDER BY tok_idx) AS text_clean
         |  FROM kept GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(len($tokensSql) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(r.kept_tokens, 0) AS BIGINT) AS kept_tokens,
         |  coalesce(r.text_clean, '') AS text_clean
         |FROM documents d LEFT JOIN rebuilt r USING (doc_id)""".stripMargin
    },

    // integer-ppm rate derivation + the same hash draw, from scratch
    "q_mixture_rebalance" -> {
      val t = rebalanceTargets
        .map { case (s0, p) => s"('$s0', CAST($p AS BIGINT))" }.mkString(", ")
      val total = rebalanceTargets.values.sum
      s"""WITH t(s, tp) AS (VALUES $t),
         |n AS (SELECT source AS s, CAST(count(*) AS BIGINT) AS n
         |      FROM documents GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM documents),
         |r AS (SELECT n.s,
         |  least(CAST(1000000 AS BIGINT),
         |    (t.tp * 1000000 // $total) * tot.nn // n.n) AS rate_ppm
         |  FROM n JOIN t ON t.s = n.s, tot)
         |SELECT d.doc_id, d.source, r.rate_ppm
         |FROM documents d JOIN r ON r.s = d.source
         |WHERE (((d.doc_id * 1000003 + 17) % $P) * 1000003 + 17) % $P
         |  % 1000000 < r.rate_ppm""".stripMargin
    },

    // consecutive-position membership over the token lists — the
    // from-first-principles phrase definition the join form must equal
    "q_phrase_search" ->
      s"""WITH tok AS (SELECT doc_id, $tokensSql AS t FROM documents),
         |m AS (SELECT doc_id,
         |  list_filter(generate_series(1, len(t) - 2),
         |    i -> t[i] = 'value' AND t[i+1] = 'table' AND t[i+2] = 'part') AS hits
         |  FROM tok)
         |SELECT doc_id,
         |  CAST(len(hits) AS BIGINT) AS n_matches,
         |  CAST(hits[1] - 1 AS INTEGER) AS first_pos
         |FROM m WHERE len(hits) > 0""".stripMargin,

    // all (posA, posB) pairs within the window, from the token lists
    "q_proximity_search" ->
      s"""WITH toks AS (SELECT doc_id, $tokensSql AS t FROM documents),
         |ab AS (SELECT doc_id,
         |  list_filter(generate_series(1, len(t)), i -> t[i] = 'table') AS pa,
         |  list_filter(generate_series(1, len(t)), i -> t[i] = 'value') AS pb
         |  FROM toks),
         |d AS (SELECT doc_id,
         |  list_filter(flatten(list_transform(pa,
         |    i -> list_transform(pb, j -> abs(i - j)))), x -> x <= 3) AS ds
         |  FROM ab)
         |SELECT doc_id,
         |  CAST(len(ds) AS BIGINT) AS n_pairs,
         |  CAST(list_min(ds) AS INTEGER) AS min_dist
         |FROM d WHERE len(ds) > 0""".stripMargin,

    // the crawl chain rebuilt from the html.parser expectations: clean
    // (nfc + C0 strip) then the standard quality CTE over the result
    "q_crawl_curate" -> {
      s"""WITH crawl AS (
         |  SELECT record_idx AS doc_id,
         |    regexp_replace(nfc_normalize(text),
         |      '[\\x00-\\x08\\x0B-\\x1F\\x7F]', '', 'g') AS text
         |  FROM read_parquet('$warcTextExpected')),
         |${qualityCteFor("crawl").stripPrefix("WITH ")}
         |SELECT doc_id, quality_score,
         |  CASE WHEN quality_score >= CAST(0.7 AS DOUBLE) THEN 'high'
         |       WHEN quality_score >= CAST(0.4 AS DOUBLE) THEN 'medium'
         |       ELSE 'low' END AS quality_bucket
         |FROM sc""".stripMargin
    },

    // the full Count-Min grid recomputed as a plain group-by over the
    // same portable affine-of-polyHash bucket family
    "q_countmin" ->
      s"""WITH toks AS (SELECT unnest($tokensSql) AS token FROM documents),
         |h AS (SELECT ${polyHashSql("token")} AS h FROM toks),
         |rs AS (SELECT unnest(generate_series(0, 3)) AS r),
         |g AS (SELECT rs.r AS r,
         |  ((h.h * (1000003 + 7919 * rs.r) + 17 + rs.r) % $P) % 256 AS b
         |  FROM h, rs)
         |SELECT CAST(r * 256 + b AS INTEGER) AS pos,
         |  count(*) AS cnt
         |FROM g GROUP BY 1""".stripMargin,

    // sequential replace-all, same order and placeholders as redactPii
    "q_redact" ->
      s"""WITH t AS (
         |  SELECT doc_id, text || ${piiSuffixSql("VARCHAR")} AS text
         |  FROM documents),
         |r AS (SELECT doc_id, text,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '${TextAnalysis.EmailRx}', '<EMAIL>', 'g'),
         |    '${TextAnalysis.PhoneRx}', '<PHONE>', 'g'),
         |    '${TextAnalysis.IpRx}', '<IP>', 'g') AS red_text
         |  FROM t)
         |SELECT doc_id, red_text,
         |  coalesce(red_text <> text, FALSE) AS redacted
         |FROM r""".stripMargin
  )

  /** The q_pca_train invariant-oracle SQL, parameterized by the dump
    * directory (q_pca_incr shares it verbatim). */
  private def pcaTrainOracle(q: String): String =
    s"""WITH got AS (SELECT * FROM read_parquet('__VERIFY_OUT__/$q/*.parquet')),
         |$embCte,
         |q AS (SELECT list_transform(v, x -> CAST(round(x * 1000000) AS HUGEINT)) AS qv FROM e),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
         |g AS (SELECT unnest(generate_series(0, 63)) AS d),
         |s1 AS (SELECT g.d AS i, sum(qv[g.d + 1]) AS s FROM q, g GROUP BY 1),
         |s2 AS (SELECT gi.d AS i, gj.d AS j, sum(qv[gi.d + 1] * qv[gj.d + 1]) AS s
         |       FROM q, g gi, g gj GROUP BY 1, 2),
         |mean AS (SELECT i, CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000) AS m
         |         FROM s1, nn),
         |cov AS (
         |  SELECT s2.i, s2.j,
         |    CAST(s2.s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000000) - ma.m * mb.m AS c
         |  FROM s2, nn, mean ma, mean mb WHERE ma.i = s2.i AND mb.i = s2.j),
         |comps AS (SELECT comp, dim, loading, eigval FROM got WHERE comp >= 0),
         |mu AS (SELECT dim, loading AS m FROM got WHERE comp = -1),
         |av AS (SELECT cp.comp, cov.i AS d, sum(cov.c * cp.loading) AS av
         |       FROM cov JOIN comps cp ON cp.dim = cov.j GROUP BY 1, 2),
         |residchk AS (SELECT max(abs(av.av - cp.eigval * cp.loading)) AS r
         |             FROM av JOIN comps cp ON cp.comp = av.comp AND cp.dim = av.d),
         |orth AS (SELECT max(abs(p.s -
         |    (CASE WHEN p.ca = p.cb THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END))) AS r
         |  FROM (SELECT a.comp AS ca, b.comp AS cb, sum(a.loading * b.loading) AS s
         |        FROM comps a JOIN comps b ON a.dim = b.dim GROUP BY 1, 2) p),
         |meanchk AS (SELECT max(abs(mu.m - mean.m)) AS r
         |            FROM mu JOIN mean ON mean.i = mu.dim),
         |evs AS (SELECT comp, min(eigval) AS ev FROM comps GROUP BY 1),
         |ordchk AS (
         |  SELECT coalesce(max(CASE WHEN lead_ev > ev + CAST(0.000000000001 AS DOUBLE)
         |    THEN 1 ELSE 0 END), 0) AS bad
         |  FROM (SELECT ev, lead(ev) OVER (ORDER BY comp) AS lead_ev FROM evs)),
         |shape AS (SELECT
         |  (SELECT count(*) FROM comps) = 512
         |  AND (SELECT count(*) FROM mu) = 64
         |  AND (SELECT count(DISTINCT (comp, eigval)) FROM comps) = 8
         |  AND (SELECT min(ev) FROM evs) > -CAST(0.000000001 AS DOUBLE) AS ok),
         |ok AS (SELECT residchk.r < CAST(0.000001 AS DOUBLE)
         |    AND orth.r < CAST(0.000000001 AS DOUBLE)
         |    AND meanchk.r < CAST(0.000000000001 AS DOUBLE)
         |    AND ordchk.bad = 0 AND shape.ok AS ok
         |  FROM residchk, orth, meanchk, ordchk, shape)
         |SELECT got.comp, got.dim, got.loading, got.eigval FROM got, ok WHERE ok.ok""".stripMargin

  /** DuckDB re-parse of the constructed URL grid from the RFC 3986
    * appendix-B reference regex plus the GRAFT-URL v1 authority rules —
    * the cross-engine mirror of the GraftUrlOps hand loop. Ends with a
    * `parsed` CTE exposing (doc_id, url, scheme, host, port, path, qs,
    * frag, canon, domain). */
  private lazy val urlParseCte: String = {
    val rx = """^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?"""
    val sufs = graft.functions.GraftUrlOps.DefaultSuffixes
      .split(',').map(s => s"'$s'").mkString(", ")
    s"""WITH urls AS (
       |  SELECT doc_id, ${urlConstructSql("VARCHAR")} AS url FROM documents),
       |p0 AS (
       |  SELECT doc_id, url,
       |    nullif(lower(regexp_extract(url, '$rx', 2)), '') AS scheme,
       |    regexp_extract(url, '$rx', 3) AS authmark,
       |    regexp_extract(url, '$rx', 4) AS auth,
       |    regexp_extract(url, '$rx', 5) AS path,
       |    nullif(regexp_extract(url, '$rx', 7), '') AS qs,
       |    nullif(regexp_extract(url, '$rx', 9), '') AS frag
       |  FROM urls),
       |p1 AS (
       |  SELECT *, CASE WHEN strpos(auth, '@') > 0
       |    THEN substr(auth, strpos(auth, '@') + 1) ELSE auth END AS hp
       |  FROM p0),
       |p2 AS (
       |  SELECT *, regexp_extract(hp, '^.*:([0-9]+)$$', 1) AS port_s FROM p1),
       |p3 AS (
       |  SELECT doc_id, url, scheme, path, qs, frag,
       |    CASE WHEN authmark = '' THEN NULL
       |         WHEN port_s <> '' THEN
       |           nullif(lower(regexp_extract(hp, '^(.*):[0-9]+$$', 1)), '')
       |         WHEN hp LIKE '%:' THEN
       |           nullif(lower(substr(hp, 1, length(hp) - 1)), '')
       |         ELSE nullif(lower(hp), '') END AS host,
       |    -- port = *DIGIT (any length); numeric value > 65535 -> absent
       |    -- (the same rule the Scala kernel applies). TRY_CAST instead
       |    -- of CAST because vectorized OR/AND do not short-circuit:
       |    -- a 20-digit suffix must yield NULL, never a conversion error.
       |    CASE WHEN authmark = '' OR port_s = '' THEN NULL
       |         WHEN TRY_CAST(port_s AS HUGEINT) IS NULL THEN NULL
       |         WHEN TRY_CAST(port_s AS HUGEINT) > 65535 THEN NULL
       |         ELSE CAST(port_s AS INTEGER) END AS port
       |  FROM p2),
       |pd AS (
       |  SELECT *,
       |    length(host) - length(replace(host, '.', '')) + 1 AS nlab,
       |    regexp_extract(host, '([^.]+)$$', 1) AS lab1,
       |    regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS lab2,
       |    regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$$', 1) AS lab3
       |  FROM p3),
       |parsed AS (
       |  SELECT doc_id, url, scheme, host, port, path, qs, frag,
       |    CASE WHEN scheme IS NULL OR host IS NULL THEN NULL
       |         ELSE concat(scheme, '://', host,
       |           CASE WHEN port IS NULL THEN ''
       |                WHEN port = 80 AND scheme IN ('http', 'ws') THEN ''
       |                WHEN port = 443 AND scheme IN ('https', 'wss') THEN ''
       |                WHEN port = 21 AND scheme = 'ftp' THEN ''
       |                ELSE concat(':', CAST(port AS VARCHAR)) END,
       |           CASE WHEN path = '' THEN '/' ELSE path END,
       |           CASE WHEN qs IS NULL THEN '' ELSE concat('?', qs) END)
       |    END AS canon,
       |    CASE WHEN host IS NULL THEN NULL
       |         WHEN regexp_matches(host, '^\\[') THEN host
       |         WHEN regexp_matches(host, '^[0-9]{1,3}(\\.[0-9]{1,3}){3}$$')
       |           THEN host
       |         WHEN host LIKE '.%' OR host LIKE '%.' OR host LIKE '%..%'
       |           THEN NULL
       |         WHEN nlab >= 3 AND lab2 IN ($sufs) THEN lab3
       |         WHEN nlab = 2 AND lab2 IN ($sufs) THEN NULL
       |         WHEN nlab >= 2 AND lab1 IN ($sufs) THEN lab2
       |         WHEN nlab = 1 AND lab1 IN ($sufs) THEN NULL
       |         WHEN nlab >= 2 THEN lab2
       |         ELSE NULL END AS domain
       |  FROM pd)""".stripMargin
  }

  /** Merge count shared by the BPE registry queries and their oracles
    * (`final val` of a literal: a compile-time constant, so it is safe to
    * reference from the eagerly-initialized maps declared above). */
  private final val BpeMerges = 8

  /** Bigram-LM model CTE chain (mirror of [[graft.llm.LangModel]] with
    * vocabSize=64): top-64 vocab `lv`, unigram fallback table `luni`,
    * per-doc positional pairs `lbp` (DuckDB's generate_series(1, 0) is
    * empty, matching the Scala size guard), sparse smoothed bigram table
    * `lbi`. Embed as `WITH $lmCte`. */
  private lazy val lmCte: String =
    s"""lt AS (SELECT unnest($tokensSql) AS token FROM documents),
       |lu AS (SELECT token, count(*) AS cnt FROM lt GROUP BY 1),
       |lv AS (SELECT token, cnt FROM lu ORDER BY cnt DESC, token ASC LIMIT 64),
       |lvs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM lv),
       |luni AS (
       |  SELECT token, cnt,
       |    CAST(round(ln(CAST(1 AS DOUBLE) / CAST(cnt + v AS DOUBLE)) * 1000000)
       |      AS BIGINT) AS fallback_micros
       |  FROM lv, lvs),
       |ldt AS (SELECT doc_id, $tokensSql AS t FROM documents),
       |lbp AS (SELECT doc_id, unnest(generate_series(1, len(t) - 1)) AS x, t FROM ldt),
       |lbg AS (
       |  SELECT t[x] AS t1, t[x + 1] AS t2, count(*) AS cnt
       |  FROM lbp GROUP BY 1, 2),
       |lbi AS (
       |  SELECT b.t1, b.t2, b.cnt,
       |    CAST(round(ln(CAST(b.cnt + 1 AS DOUBLE) / CAST(u1.cnt + v AS DOUBLE)) * 1000000)
       |      AS BIGINT) AS loglik_micros
       |  FROM lbg b
       |  JOIN lv u1 ON b.t1 = u1.token
       |  JOIN lv u2 ON b.t2 = u2.token, lvs)""".stripMargin

  /** One BPE merge application as a DuckDB fold: left-to-right
    * non-overlapping replacement of adjacent (l, r) with l||r — the
    * exact mirror of [[graft.functions.GraftBpeOps.applyMerge]]. `lvl`
    * uniquifies the lambda variables for nesting. */
  private def bpeApplySql(syms: String, l: String, r: String, lvl: String): String =
    s"""list_reduce(list_prepend(CAST([] AS VARCHAR[]), list_transform($syms, s$lvl -> [s$lvl])),
       |  (acc$lvl, x$lvl) -> CASE
       |    WHEN len(acc$lvl) > 0 AND acc$lvl[-1] = $l AND x$lvl[1] = $r
       |    THEN list_append(acc$lvl[1:len(acc$lvl)-1], $l || $r)
       |    ELSE list_append(acc$lvl, x$lvl[1]) END)""".stripMargin

  /** BPE training CTE chain (mirror of [[graft.llm.Bpe.train]]): capped
    * word histogram `bh`, symbolized `w0`, then per round `p$i` (weighted
    * adjacent-pair counts, overlaps included), `b$i` (adopted merge —
    * count desc, left asc, right asc; chr(2) sentinel once pairs
    * exhaust) and `w$i` (re-segmented histogram). */
  private def bpeCte(m: Int, maxWords: Int): String = {
    val rounds = (1 to m).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT string_split(pair, chr(1))[1] AS l, string_split(pair, chr(1))[2] AS r,
         |    CAST(sum(cnt) AS BIGINT) AS cnt
         |  FROM (SELECT cnt, unnest(list_transform(generate_series(1, len(syms) - 1),
         |      j$i -> syms[j$i] || chr(1) || syms[j$i + 1])) AS pair
         |    FROM w${i - 1})
         |  GROUP BY 1, 2),
         |b$i AS MATERIALIZED (
         |  SELECT * FROM (SELECT l, r FROM p$i ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)
         |  UNION ALL
         |  SELECT chr(2), chr(2) WHERE (SELECT count(*) FROM p$i) = 0),
         |w$i AS MATERIALIZED (
         |  SELECT word, cnt, ${bpeApplySql("syms", "b.l", "b.r", i.toString)} AS syms
         |  FROM w${i - 1}, b$i b)""".stripMargin
    }.mkString(",\n")
    s"""bh AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest($tokensSql) AS word FROM documents)
       |  GROUP BY 1 ORDER BY cnt DESC, word ASC LIMIT $maxWords),
       |w0 AS (SELECT word, cnt,
       |  list_transform(generate_series(1, len(word)), c0 -> substr(word, c0, 1)) AS syms
       |  FROM bh),
       |$rounds""".stripMargin
  }

  /** Naive-Bayes model CTE chain (mirror of [[graft.llm.Classify.nbTrain]]
    * with vocabSize=64 over documents.lang): top-64 vocab (count desc,
    * token asc), dense label×vocab grid, add-one smoothing over the
    * in-vocab label totals, micro-log quantization. Exposes `labels`
    * (label, n_docs) and `model` (label, token, cnt, loglik_micros);
    * embed as `WITH $nbModelCte`. */
  private lazy val nbModelCte: String =
    nbModelCteBody

  /** ±1-micro tolerance echo for a MODEL-TABLE oracle whose values carry a
    * `round(ln(p/q)·1e6)` quantization — the acknowledged cross-engine
    * libm policy: neither the JVM's `StrictMath.log` (Spark's math
    * expressions) nor DuckDB's libm is correctly rounded, so a true value
    * within ~1 ulp of a `.5`-micros boundary may legally round apart by
    * ONE micro between the engines. The oracle therefore verifies every
    * row — keys and exact (integer-count) columns null-safe-equal, the
    * micro column within `tolMicros` — and, when ALL rows verify, echoes
    * the Spark rows verbatim so the driver's exact-hash compare stays
    * exact; any real defect (wrong row set, wrong count, value off by
    * > tol) echoes the independent DuckDB model instead and fails the
    * hash. Downstream score sums (`q_lm_score`, `q_nb_classify`,
    * `q_ccnet_buckets`, the curate gates) consume the QUANTIZED integer
    * model on the Spark side, so their oracles stay exact once the model
    * entries agree; `LnBoundarySpec` measures the actual boundary margins
    * of the shipped model tables (orders of magnitude above the ulp
    * error) so residual exposure is quantified, not assumed away. */
  private def lnToleranceEcho(
      queryName: String,
      expectedBody: String, // full WITH-body whose LAST cte is `expected`
      keyCols: Seq[String],
      exactCols: Seq[String],
      microCol: String,
      tolMicros: Int = 1): String = {
    val cols = (keyCols ++ exactCols :+ microCol)
    val keyEq = keyCols.map(k => s"g.$k = e.$k").mkString(" AND ")
    val exactNe = exactCols.map(c => s"g.$c IS DISTINCT FROM e.$c")
      .mkString(" OR ")
    val exactClause = if (exactCols.isEmpty) "" else s"OR $exactNe "
    s"""$expectedBody,
       |got AS (SELECT * FROM read_parquet('__VERIFY_OUT__/$queryName/*.parquet')),
       |chk AS (SELECT
       |  (SELECT count(*) FROM got) = (SELECT count(*) FROM expected) AND
       |  NOT EXISTS (
       |    SELECT 1 FROM got g FULL JOIN expected e ON $keyEq
       |    WHERE g.${keyCols.head} IS NULL OR e.${keyCols.head} IS NULL
       |      ${exactClause}OR g.$microCol IS NULL OR e.$microCol IS NULL
       |      OR abs(g.$microCol - e.$microCol) > $tolMicros) AS pass)
       |SELECT ${cols.mkString(", ")} FROM got WHERE (SELECT pass FROM chk)
       |UNION ALL
       |SELECT ${cols.mkString(", ")} FROM expected WHERE NOT (SELECT pass FROM chk)""".stripMargin
  }

  private lazy val nbModelCteBody: String =
    s"""tc AS (
       |  SELECT lang AS label, unnest($tokensSql) AS token
       |  FROM documents WHERE lang IS NOT NULL),
       |cnts AS (SELECT label, token, count(*) AS cnt FROM tc GROUP BY 1, 2),
       |vocab AS (
       |  SELECT token FROM (SELECT token, sum(cnt) AS tot FROM cnts GROUP BY 1)
       |  ORDER BY tot DESC, token ASC LIMIT 64),
       |vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
       |iv AS (SELECT c.* FROM cnts c JOIN vocab USING (token)),
       |labels AS (
       |  SELECT lang AS label, count(*) AS n_docs
       |  FROM documents WHERE lang IS NOT NULL GROUP BY 1),
       |nlt AS (
       |  SELECT l.label, coalesce(s.t_l, 0) AS t_l
       |  FROM labels l
       |  LEFT JOIN (SELECT label, sum(cnt) AS t_l FROM iv GROUP BY 1) s USING (label)),
       |grid AS (
       |  SELECT nlt.label, vv.token, coalesce(i.cnt, 0) AS cnt, nlt.t_l
       |  FROM nlt CROSS JOIN vocab vv
       |  LEFT JOIN iv i ON i.label = nlt.label AND i.token = vv.token),
       |model AS (
       |  SELECT label, token, CAST(cnt AS BIGINT) AS cnt,
       |    CAST(round(ln(CAST(cnt + 1 AS DOUBLE) / CAST(t_l + v AS DOUBLE)) * 1000000)
       |      AS BIGINT) AS loglik_micros
       |  FROM grid, vs)""".stripMargin

  /** Quality-score CTE chain (tok → f → sc); mirror of
    * [[graft.llm.TextAnalysis.qualityScore]]. End with `SELECT ... FROM sc`. */
  private lazy val qualityCte: String = qualityCteFor("documents")

  /** The quality-score CTE chain over any (doc_id, text) source table. */
  private def qualityCteFor(src: String): String =
    s"""WITH tok AS (SELECT doc_id, $tokensSql AS t FROM $src),
       |f AS (
       |  SELECT doc_id,
       |    CAST(least(len(t), 50) AS DOUBLE) / CAST(50 AS DOUBLE) AS length_term,
       |    CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS diversity_term,
       |    CAST(len(list_filter(t, w -> w IN (${TextAnalysis.Stopwords.map("'" + _ + "'").mkString(", ")})))
       |      AS DOUBLE) / len(t) AS stop_ratio,
       |    (list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(t, w -> CAST(len(w) AS BIGINT))), (a, c) -> a + c))
       |      / CAST(len(t) AS DOUBLE) AS mean_len
       |  FROM tok),
       |sc AS (
       |  SELECT doc_id,
       |    length_term * CAST(0.25 AS DOUBLE)
       |      + diversity_term * CAST(0.25 AS DOUBLE)
       |      + (CASE WHEN stop_ratio BETWEEN CAST(0.02 AS DOUBLE) AND CAST(0.5 AS DOUBLE)
       |              THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) * CAST(0.25 AS DOUBLE)
       |      + (CASE WHEN mean_len BETWEEN CAST(2.0 AS DOUBLE) AND CAST(10.0 AS DOUBLE)
       |              THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) * CAST(0.25 AS DOUBLE)
       |      AS quality_score
       |  FROM f)""".stripMargin

  /** Shared simhash CTE (24-bit, word tokens). */
  private lazy val simhashSql: String =
    s"""WITH tok AS (SELECT doc_id, $tokensSql AS t FROM documents),
       |th AS (
       |  SELECT doc_id, list_transform(t, s -> ${polyHashSql("s", "ci")}) AS h FROM tok),
       |sim AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(0, 23), i ->
       |      CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
       |               list_transform(h, x -> CASE WHEN (x >> i) & 1 = 1
       |                 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)),
       |               (a, b) -> a + b) > 0
       |           THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END)),
       |      (a, b) -> a + b) AS simhash
       |  FROM th)""".stripMargin

  /** Language-ID oracle: replicates the fold-based argmax with declaration
    * -order tie-breaking of [[TextAnalysis.langId]]. */
  private lazy val langIdSql: String = {
    val scoreExprs = TextAnalysis.LangMarkers.map { case (lang, words) =>
      s"CAST(len(list_filter(t, w -> w IN (${words.map("'" + _ + "'").mkString(", ")}))) AS BIGINT) AS score_$lang"
    }
    // fold argmax: strict > keeps earlier lang on ties
    val predicted = TextAnalysis.LangMarkers.map(_._1).foldLeft(("''", "CAST(-1 AS BIGINT)")) {
      case ((bestLang, bestScore), lang) =>
        (s"(CASE WHEN score_$lang > $bestScore THEN '$lang' ELSE $bestLang END)",
          s"(CASE WHEN score_$lang > $bestScore THEN score_$lang ELSE $bestScore END)")
    }._1
    s"""WITH tok AS (SELECT doc_id, $tokensSql AS t FROM documents),
       |scored AS (SELECT doc_id, ${scoreExprs.mkString(", ")} FROM tok)
       |SELECT doc_id, ${TextAnalysis.LangMarkers.map(m => "score_" + m._1).mkString(", ")},
       |  $predicted AS predicted_lang
       |FROM scored""".stripMargin
  }
}
