package graft

import graft.llm._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** C1 — the LLM-side analog of [[ScaleSmoke]]'s E1: one "corpus drop"
  * through the WHOLE curation stack at profile scale, timed per stage
  * (dev tool, not part of the driver contract). The corpus and the
  * embedding table are generated ON EXECUTORS as pure column expressions
  * over `spark.range` — zero input I/O, zero driver materialization —
  * with planted structure so every stage has real work:
  *
  *  - ~2.7% exact duplicates (`id % 37 == 0` copies a base-1000 doc);
  *  - ~1.9% near duplicates (`id % 53 == 0` appends a tail to one);
  *  - per-language vocabulary segments (separable naive-Bayes signal);
  *  - embedding near-dup groups (shared base vector per 17 ids + 1e-3
  *    jitter) for the SemDeDup stage.
  *
  * Stages: exact dedup → quality gate → MinHash LSH pairs + clusters →
  * NB train/score (accuracy vs the generator's labels) → bigram-LM
  * scoring → PCA (model + projections) → BPE train(64) + encode →
  * heavy-hitters sketch → SemDeDup over embeddings. Prints per-stage
  * seconds, stage row counts, total wall and driver peak RSS; exits
  * nonzero if any stage returns zero rows.
  *
  * Sizes via `GRAFT_C1_DOCS` (default 500k docs ≈ 60M tokens) and
  * `GRAFT_C1_VECS` (default 200k × 64-dim). Measured pins live in
  * BASELINE.md.
  */
object ProfileC1 {

  private val V = 2000
  private val Langs = Seq("en", "de", "fr", "es", "zh")

  /** Deterministic synthetic corpus: (doc_id, text, lang). */
  private[graft] def syntheticDocs(spark: SparkSession, n: Long): DataFrame = {
    // varied suffixes give BPE non-trivial merges; 400 words per language
    // segment give the classifier separable likelihoods
    val vocab = typedlit((0 until V).map(i => s"w$i${"abcdefgh".take(1 + i % 5)}"))
    val langsLit = typedlit(Langs)
    def langIx(seed: Column): Column = pmod(seed, lit(5L)).cast("int")
    def baseText(seed: Column): Column = {
      val len = (lit(40) + pmod(seed, lit(80))).cast("int")
      concat_ws(" ", transform(sequence(lit(1), len), i => {
        val u = pmod(abs(xxhash64(seed, i)), lit(1000L))
        // Zipf-ish skew: squaring a uniform concentrates mass on low ranks
        val r = ((u * u) / lit(2500L)).cast("int") // 0..399
        element_at(vocab, langIx(seed) * 400 + r + 1)
      }))
    }
    // base-seed count scales with n (1000 at the 500k default) so
    // planted dup-GROUP sizes stay constant as the corpus grows — real
    // corpora grow in group COUNT, not group size, and a linearly
    // growing group would just saturate the LSH bucket cap (the 10x
    // stretch measured exactly that before this fix: pairs=0 at 5M)
    val nBases = math.max(1000L, n / 500L)
    spark.range(n).select(
      col("id").as("doc_id"),
      when(col("id") % 37 === 0, pmod(col("id"), lit(nBases)))
        .when(col("id") % 53 === 0, pmod(col("id"), lit(nBases)))
        .otherwise(col("id")).as("seed"),
      (col("id") % 53 === 0 && col("id") % 37 =!= 0).as("near"))
      .select(
        col("doc_id"),
        when(col("near"), concat(baseText(col("seed")), lit(" zz near tail")))
          .otherwise(baseText(col("seed"))).as("text"),
        element_at(typedlit(Langs), langIx(col("seed")) + 1).as("lang"))
  }

  /** Deterministic synthetic embeddings: (vec_id, embedding float[64])
    * in near-dup groups of 17. */
  private[graft] def syntheticEmbeddings(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)),
        i => ((pmod(abs(xxhash64(floor(col("id") / 17).cast("long"), i)), lit(2000L)) - 1000L) / 1000.0
          + (pmod(abs(xxhash64(col("id"), i)), lit(11L)) - 5L) * 0.001)
          .cast("float")).as("embedding"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nDocs = sys.env.getOrElse("GRAFT_C1_DOCS", "500000").toLong
    val nVecs = sys.env.getOrElse("GRAFT_C1_VECS", "200000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", classOf[graft.functions.GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Recall-only mode (GRAFT_C1_RECALL_ONLY=1): the per-round SCALE pin
    // of the adaptive recall curve (r19 ask #8) — just the 1M-vector
    // RecallGate measurement against the scale floors, cheap enough to
    // re-run at every round close (BASELINE.md documents the pin), so a
    // probe-coverage regression at scale surfaces mechanically instead
    // of only at the 20k bench scale. Exits nonzero on a floor breach.
    if (sys.env.get("GRAFT_C1_RECALL_ONLY").contains("1")) {
      val nV = sys.env.getOrElse("GRAFT_C1_VECS", "1000000").toLong
      val s0 = System.nanoTime()
      val (metrics, ok) = RecallGate.measureScale(spark, nV)
      val secs = (System.nanoTime() - s0) / 1e9
      println(f"[c1-recall] vecs=$nV%d ${secs}%.1f s  " +
        metrics.map { case (k, v) => s"$k=$v" }.mkString("  ") +
        s"  scale_floor_ok=${if (ok) 1 else 0}")
      spark.stop()
      if (!ok) sys.exit(1)
      return
    }
    val t0 = System.nanoTime()
    var failed = false
    def stage(name: String)(body: => Seq[(String, Long)]): Unit = {
      val s0 = System.nanoTime()
      val counts = body
      val secs = (System.nanoTime() - s0) / 1e9
      counts.foreach { case (k, v) => if (v == 0) failed = true }
      println(f"[c1] $name%-16s ${secs}%7.2f s  " +
        counts.map { case (k, v) => s"$k=$v" }.mkString("  "))
    }

    // generation is part of no stage: materialize the corpus once, like
    // a real drop landing in object storage (the curation stack re-reads
    // it per stage exactly as the registry queries re-read parquet)
    val docs = syntheticDocs(spark, nDocs).localCheckpoint()
    val embs = syntheticEmbeddings(spark, nVecs).localCheckpoint()
    println(s"[c1] corpus: $nDocs docs, $nVecs vectors, ${cpus} threads")

    stage("exact_dedup") {
      val d = Dedup.exact(docs, "doc_id", "text")
      val groups = d.count()
      val copies = d.agg(sum(col("n_copies") - 1)).head().getLong(0)
      Seq("groups" -> groups, "extra_copies" -> copies)
    }
    stage("quality_gate") {
      val q = TextAnalysis.qualityScore(docs, "doc_id", "text")
      Seq("scored" -> q.count(),
        "kept" -> q.filter(col("quality_bucket") =!= "low").count())
    }
    var pairsCount = 0L
    stage("minhash_lsh") {
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text", minJaccard = 0.5)
        .localCheckpoint()
      pairsCount = pairs.count()
      val clusters = Dedup.clusters(docs.select(col("doc_id")), pairs)
      Seq("pairs" -> pairsCount,
        "non_singleton" -> clusters.filter(col("cluster_id") =!= col("doc_id")).count())
    }
    stage("nb_classifier") {
      val scored = Classify.nbClassify(docs, "doc_id", "text", "lang",
        vocabSize = 256, passThrough = Seq("lang"))
      val agree = scored.filter(col("predicted_label") === col("lang")).count()
      Seq("scored" -> nDocs, "label_agreement" -> agree)
    }
    stage("lm_score") {
      val scored = LangModel.lmScore(docs, "doc_id", "text", vocabSize = 256)
      // the generator's text is drawn from the trained distribution, so
      // most documents clear a loose per-pair floor
      val kept = scored.filter(col("lp_micros") >= lit(-8000000L) * col("n_pairs")).count()
      Seq("scored" -> scored.count(), "above_floor" -> kept)
    }
    stage("pca") {
      val model = Pca.pcaModel(embs, "vec_id", "embedding", dim = 64, k = 8)
      val proj = Pca.pcaProject(embs, "vec_id", "embedding", model)
      Seq("model_rows" -> model.count(), "projections" -> proj.count())
    }
    stage("bpe") {
      val merges = Bpe.train(docs, "doc_id", "text", merges = 64, maxWords = 100000)
      val enc = Bpe.encode(docs, "doc_id", "text", merges)
      Seq("merges" -> merges.size.toLong,
        "total_tokens" -> enc.agg(sum("n_tokens")).head().getLong(0))
    }
    stage("heavy_hitters") {
      val hh = docs
        .select(explode(TextHash.wordTokens(col("text"))).as("token"))
        .agg(graft.functions.TopKFreq(col("token"), 100, 4096).as("hh"))
        .select(explode(col("hh")).as("h")).select("h.item", "h.est", "h.err")
        .collect()
      Seq("reported" -> hh.length.toLong,
        "exact" -> (if (hh.forall(_.getLong(2) == 0L)) 1L else 0L))
    }
    stage("semantic_dedup") {
      val sd = Dedup.semantic(embs, "vec_id", "embedding",
        k = 512, iters = 2, tau = 0.97)
      Seq("kept" -> sd.filter(col("keep")).count(),
        "removed" -> sd.filter(!col("keep")).count())
    }
    var ivfPqModels: (Pq.PqModel, Pq.PqModel) = null
    var ivfPqIndex: DataFrame = null
    stage("ivfpq_index") {
      // the L55 production path end to end: two-stage train, one
      // zero-shuffle encode pass persisted cell-partitioned (the serving
      // layout), then a pruned probe search that reads only its probed
      // cells' files and never loads a float vector. The planted 17-id
      // near-dup groups give a recall signal: vec 0's group should head
      // its own top-k.
      val (coarse, pq) = Pq.ivfPqTrain(embs, "vec_id", "embedding",
        dim = 64, cells = 64, m = 8, k = 64)
      val dir = java.nio.file.Files.createTempDirectory("c1_ivfpq").toString
      Pq.ivfPqEncode(embs, "vec_id", "embedding", coarse, pq)
        .write.partitionBy("cell").mode("overwrite").parquet(dir)
      val index = spark.read.parquet(dir)
      ivfPqModels = (coarse, pq)
      ivfPqIndex = index
      val q = embs.filter(col("vec_id") === 0L)
        .select(Similarity.asDouble(col("embedding"))).head.getSeq[Double](0).toArray
      val top = Pq.ivfPqSearchOverIndex(index, coarse, pq, q,
        nProbes = 8, topK = 100).localCheckpoint()
      Seq("index_rows" -> index.count(),
        "top_k" -> top.count(),
        "group_recall" -> top.filter(col("vec_id") < 17).count())
    }

    stage("ann_recall") {
      // retrieval QUALITY, not just determinism (the registry oracles pin
      // the latter): recall@10/@100 of the IVF-PQ batch serving path vs
      // the exact bruteForceTopK ground truth, across the nProbes ladder.
      // Reported as permille; the floor is a REGRESSION pin (measured
      // band minus slack, SCALE.md), so a quantizer/search change that
      // silently degrades retrieval fails C1 instead of shipping.
      import org.apache.spark.sql.expressions.Window
      val (coarse, pq) = ivfPqModels
      val nQ = 32
      val qIds: Seq[Long] = (0 until nQ).map(i => i.toLong * (nVecs / nQ) + 3)
      // exact ground truth in the metric the index SERVES (L2): the
      // cosine bruteForceTopK would measure a metric mismatch, not the
      // quantizer. Same exchange shape as bruteForceTopK: queries
      // broadcast, mergeable top-k per query, corpus never shuffles.
      val dot = graft.functions.HashFunctions.dot _
      val corpusV = embs.select(col("vec_id").as("neighbor_id"),
        Similarity.asDouble(col("embedding")).as("vn"))
      val queriesV = embs.filter(col("vec_id").isin(qIds: _*))
        .select(col("vec_id").as("query_id"),
          Similarity.asDouble(col("embedding")).as("vq"))
      val truth = corpusV
        .join(broadcast(queriesV), col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          (dot(col("vq"), col("vq")) + dot(col("vn"), col("vn")) -
            lit(2.0) * dot(col("vq"), col("vn"))).as("dist_sq"))
        .groupBy("query_id")
        .agg(graft.functions.TopKByScore(-col("dist_sq"), col("neighbor_id"), 100)
          .as("__top"))
        .select(col("query_id"), posexplode(col("__top")).as(Seq("__r", "__t")))
        .select(col("query_id"), col("__t.id").as("neighbor_id"),
          (col("__r") + 1).cast("int").as("rank"))
        .localCheckpoint()
      val queries = embs.filter(col("vec_id").isin(qIds: _*))
      def recallPermille(got: DataFrame, k: Int): Long = {
        val hits = truth.filter(col("rank") <= k)
          .join(got.filter(col("arank") <= k), Seq("query_id", "neighbor_id"))
          .count()
        hits * 1000L / (nQ.toLong * k)
      }
      val byProbe = Seq(1, 4, 16).flatMap { p =>
        // +1 then self-filter + re-rank: bruteForceTopK excludes the
        // query itself, the ANN index contains it
        val got = Pq.ivfPqSearchBatchOverIndex(ivfPqIndex, coarse, pq,
          queries, "vec_id", "embedding", nProbes = p, topK = 101)
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("arank", row_number().over(Window.partitionBy("query_id")
            .orderBy(col("dist_micros").asc, col("vec_id").asc)))
          .select(col("query_id"), col("vec_id").as("neighbor_id"), col("arank"))
          .localCheckpoint()
        Seq(s"r10_p$p" -> recallPermille(got, 10),
          s"r100_p$p" -> recallPermille(got, 100))
      }.toMap ++ {
        // the float re-rank closes the ADC ORDERING tail; the probe LADDER
        // measures the COVERAGE tail (r17 verdict item 2): on this
        // worst-case isotropic-tail distribution the true top-100 scatter
        // near-uniformly over cells, so recall@100 tracks probed corpus
        // fraction — the measured curve IS the sizing rule (probe until
        // occupancy ≈ target recall x corpus; clustered real data needs
        // far less). Candidates scale with probes so the re-rank pool
        // never truncates coverage.
        // two dials, both measured: probe fraction (COVERAGE — which true
        // neighbors are reachable at all) and re-rank candidates (ADC
        // ORDERING — whether reachable true neighbors survive the ADC cut
        // into the float re-rank; at 1M the 5001-cut binds before
        // coverage does, so the k50 rung scales candidates with corpus)
        Seq((16, 5001), (32, 5001), (48, 5001), (48, 50001)).flatMap {
          case (p, cand) =>
            val rr = Pq.ivfPqSearchRerankBatch(ivfPqIndex, coarse, pq, embs,
              "vec_id", "embedding", queries, nProbes = p,
              candidates = cand, topK = 101)
              .filter(col("vec_id") =!= col("query_id"))
              .withColumn("arank", row_number().over(Window.partitionBy("query_id")
                .orderBy(col("dist_sq_micros").asc, col("vec_id").asc)))
              .select(col("query_id"), col("vec_id").as("neighbor_id"), col("arank"))
              .localCheckpoint()
            val tag = if (cand > 5001) s"p${p}k50" else s"p$p"
            Seq(s"r10_rr_$tag" -> recallPermille(rr, 10),
              s"r100_rr_$tag" -> recallPermille(rr, 100))
        }.toMap
      } ++ {
        // the ADAPTIVE production shape: probe by candidate budget (the
        // scan-cost dial) instead of a fixed cell count — budget = 75% of
        // the corpus targets >=700 permille on the worst-case
        // distribution, with the candidate cut scaled to ~5% of the
        // budget so ADC ordering noise doesn't re-truncate coverage
        val adCand = math.max(5001L, nVecs * 3 / 4 / 20).min(100001L).toInt
        val ad = Pq.ivfPqSearchRerankAdaptive(ivfPqIndex, coarse, pq, embs,
          "vec_id", "embedding", queries,
          candidateBudget = nVecs * 3 / 4, maxProbes = 64,
          candidates = adCand, topK = 101)
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("arank", row_number().over(Window.partitionBy("query_id")
            .orderBy(col("dist_sq_micros").asc, col("vec_id").asc)))
          .select(col("query_id"), col("vec_id").as("neighbor_id"), col("arank"))
          .localCheckpoint()
        Map("r10_ad" -> recallPermille(ad, 10), "r100_ad" -> recallPermille(ad, 100))
      }
      // Regression pin, set from the measured band (SCALE.md), NOT an
      // aspiration: this synthetic distribution CAPS recall@10 near
      // 10·(10/16) ≈ 620‰ — a query's true top-10 are 10 of its 16
      // jittered group mates, whose 1e-3 jitter is far below codeword
      // granularity, so every quantized method ties them and id-order
      // picks ~10/16 of the right set. r100's tail is the classic
      // re-rank regime: the other ~84 true neighbors are drawn from
      // near-equidistant isotropic noise that 8-byte ADC codes cannot
      // order (measured 342‰ @200k, 232‰ @1M; more probes can even dip
      // it — farther cells contribute ADC-noisy candidates that displace
      // true ones, so NO monotonicity pin). The floor catches a
      // quantizer/search REGRESSION; absolute tail quality needs a float
      // re-rank stage, deliberately absent from the no-floats index.
      // floors are regression pins = measured band minus slack (SCALE.md):
      // ADC-only r10/r100 unchanged; r18 adds the production adaptive+
      // re-rank shape, measured 934 permille @1M / 880+ @100k-200k — a
      // quantizer, probe-rule, or re-rank regression now fails C1 by name
      val floorOk = if (byProbe("r10_p16") >= 550 && byProbe("r100_p16") >= 180 &&
        byProbe("r10_ad") >= 950 && byProbe("r100_ad") >= 700) 1L else 0L
      byProbe.toSeq.sortBy(_._1) :+ ("recall_floor_ok" -> floorOk)
    }

    stage("profile_incr") {
      // two "drops" profiled once each into mergeable states; the merge
      // must equal the one-pass profile (both frames are dimension-sized,
      // so the equality check is a driver compare)
      val even = pmod(col("doc_id"), lit(2)) === 0
      val merged = Profile.merge(Seq(
        Profile.state(docs.filter(even)),
        Profile.state(docs.filter(!even)))).collect().map(_.toString).sorted.toSeq
      val onePass = Profile.profile(docs).collect().map(_.toString).sorted.toSeq
      Seq("cols" -> merged.length.toLong,
        "match_onepass" -> (if (merged == onePass) 1L else 0L))
    }
    stage("taxonomy_tag") {
      // topics over the generator's vocabulary (suffix cycle abcdefgh)
      val tags = TextAnalysis.tagTaxonomy(docs, "doc_id", "text", Seq(
        "short" -> Seq("w0a", "w5a", "w10a"),
        "long" -> Seq("w4abcde", "w9abcde"),
        "frag" -> Seq("abcd")))
      Seq("rows" -> tags.count(),
        "docs_tagged" -> tags.filter(col("n_matches") > 0)
          .select("doc_id").distinct().count())
    }
    stage("ccnet_buckets") {
      val b = LangModel.ccnetBuckets(docs, "doc_id", "text", "lang",
        vocabSize = 256)
      val byBucket = b.groupBy("bucket").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      Seq("head" -> byBucket.getOrElse("head", 0L),
        "middle" -> byBucket.getOrElse("middle", 0L),
        "tail" -> byBucket.getOrElse("tail", 0L))
    }
    stage("vocab_growth") {
      val g = TextAnalysis.vocabGrowth(docs, "doc_id", "text").collect()
        .sortBy(_.getInt(0))
      Seq("checkpoints" -> g.length.toLong,
        "final_distinct" -> g.last.getLong(2))
    }
    stage("clean_redact") {
      // NFC + control strip, then PII redaction — two zero-shuffle
      // projections; a quarter of the docs get a planted PII tail
      val tailed = docs.select(col("doc_id"),
        concat(col("text"), when(pmod(col("doc_id"), lit(4)) === 0,
          lit(" mail a@b.com or 10.0.0.1")).otherwise(lit(""))).as("text"))
      val c = TextAnalysis.cleanText(tailed, "text")
      val r = TextAnalysis.redactPii(
        c.select(col("doc_id"), col("clean_text").as("text")), "doc_id", "text")
      Seq("cleaned" -> c.count(),
        "redacted" -> r.filter(col("redacted")).count())
    }
    stage("url_domain_cap") {
      // ~1000 registrable domains x ~500 docs, capped at 100: the URL
      // kernels are scan projections, the cap is one (domain) window
      val urls = docs.select(col("doc_id"),
        concat(lit("https://sub"),
          pmod(col("doc_id"), lit(5000L)).cast("string"),
          lit(".host"), pmod(col("doc_id"), lit(997L)).cast("string"),
          lit(".co.uk/p/"), col("doc_id").cast("string")).as("url"))
      val capped = Mixture.domainCap(urls, "doc_id", "url", perDomain = 100)
        .localCheckpoint()
      Seq("kept" -> capped.count(),
        "domains" -> capped.select("domain").distinct().count())
    }
    stage("countmin") {
      // one corpus token pass into a 4x4096 grid; mass conservation is
      // the zero-rows guard (each row sums to the token count)
      val grid = docs
        .select(explode(TextHash.wordTokens(col("text"))).as("token"))
        .agg(graft.functions.CountMin(col("token"), depth = 4, width = 4096).as("sk"))
        .head().getSeq[Long](0)
      Seq("tokens" -> grid.slice(0, 4096).sum,
        "nonzero_buckets" -> grid.count(_ > 0).toLong)
    }

    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[c1] TOTAL ${wall}%.1f s  peakRss=${ScaleSmoke.peakRssMb()} MB  " +
      s"docs=$nDocs vecs=$nVecs")
    spark.stop()
    if (failed) { System.err.println("[c1] FAILED: a stage returned zero rows"); sys.exit(1) }
  }
}
