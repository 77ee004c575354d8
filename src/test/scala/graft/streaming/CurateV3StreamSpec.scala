package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.llm.{Curation, CurationArtifacts}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming seven-gate curation sink ([[CorpusStream.curateV3GateBatch]]):
  * batch-curateV3 equivalence on a fixed split, replay idempotence, verdict
  * totality, and cross-batch store semantics. The equivalence discipline is
  * [[graft.llm.Curation.curateV2With]]'s: models trained on the full
  * corpus, history stores accumulated by gating the history as batch 0,
  * split chosen so no near-dup chain crosses it and each registrable
  * domain lives wholly on one side (the domain gate is first-arrived-wins
  * across batches — order-equivalent to the batch window only when no
  * domain straddles the split). */
class CurateV3StreamSpec extends SparkSpec {
  import spark.implicits._

  private def work(): String =
    Files.createTempDirectory("curatev3stream").toString

  /** Synthetic registrable domains that never straddle the history/drop
    * split: h<k>-a.com for history ids, d<k>-a.com for drop ids. */
  private def withUrl(docs: DataFrame, splitId: Long): DataFrame =
    docs.withColumn("url",
      concat(lit("https://www."),
        when(col("doc_id") <= splitId, concat(lit("h"), pmod(col("doc_id"), lit(7L))))
          .otherwise(concat(lit("d"), pmod(col("doc_id"), lit(7L)))),
        lit("-a.com/"), col("doc_id").cast("string")))

  private val accept = Set("en", "de", "fr")
  private val PerDomain = 10

  private def gateBatch(w: String, models: CurationArtifacts, bench: DataFrame)(
      batch: DataFrame, id: Long): Unit =
    CorpusStream.curateV3GateBatch(batch, id, "url",
      s"$w/kept", s"$w/rej", s"$w/digest", s"$w/domain", s"$w/postings", s"$w/sigs",
      models.nbTokenModel, models.nbPriors, models.lmUnigrams, models.lmBigrams,
      bench, accept, perDomain = PerDomain,
      digestBuckets = 8, domainBuckets = 8, postingsBuckets = 8, sigBuckets = 8,
      compactEvery = 0)

  private def routedVerdicts(spark: org.apache.spark.sql.SparkSession,
      w: String, batchId: Long): Set[(Long, Boolean, String)] = {
    val kept = spark.read.parquet(s"$w/kept/batch=$batchId")
      .select(col("doc_id"), col("reason"))
    val rej = spark.read.parquet(s"$w/rej/batch=$batchId")
      .select(col("doc_id"), col("reason"))
    kept.unionByName(rej)
      .select(col("doc_id"), (col("reason") === "kept").as("keep"), col("reason"))
      .as[(Long, Boolean, String)].collect().toSet
  }

  test("routing ≡ batch curateV3 on a fixed split (history as batch 0, drop as batch 1)") {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val splitId = base.selectExpr("percentile(doc_id, 0.8)").head.getDouble(0).toLong
    val corpus = withUrl(base, splitId).localCheckpoint()
    val history = corpus.filter(col("doc_id") <= splitId)
    val drop = corpus.filter(col("doc_id") > splitId)
    assert(history.count() > 0 && drop.count() > 0)
    // the fixed benchmark: a handful of corpus texts (same for both sides)
    val bench = corpus.filter(pmod(col("doc_id"), lit(97L)) === 0L).select("text")
    assert(bench.count() > 0)
    val models = CurationArtifacts.build(corpus, "doc_id", "text", "lang")

    val w = work()
    val gate = gateBatch(w, models, bench) _
    gate(history, 0L)
    gate(drop, 1L)

    val expected = Curation.curateV3(corpus, "doc_id", "text", "lang", "url",
      benchmark = bench.withColumnRenamed("text", "text"), acceptLabels = accept,
      perDomain = PerDomain)
      .join(drop.select("doc_id"), Seq("doc_id"), "left_semi")
      .as[(Long, Boolean, String)].collect().toSet
    val got = routedVerdicts(spark, w, 1L)
    assert(got == expected,
      s"streamed verdicts diverge from batch curateV3:\n" +
        s"only-batch: ${(expected -- got).take(5)}\nonly-stream: ${(got -- expected).take(5)}")
  }

  test("each of the seven gates fires through the sink with history state") {
    val good = "the quick brown fox jumps over a lazy dog of the north valley"
    val history = Seq(
      (1L, good, "en", "https://www.hist-one.com/1"),
      (2L, "some other perfectly healthy reference document content here", "en",
        "https://www.hist-two.com/2"),
      (3L, "hot domain filler document with plenty of unique healthy words", "en",
        "https://www.hot.com/3"))
      .toDF("doc_id", "text", "lang", "url")
    val trainCorpus = Seq(
      (1L, good, "en"), (2L, good + " north", "en"),
      (3L, "zonk blip zork vex nim quux zonk blip zork vex nim", "zz"))
      .toDF("doc_id", "text", "lang")
    val models = CurationArtifacts.build(trainCorpus, "doc_id", "text", "lang")
    val bench = Seq("bench mark answer text leaks here today").toDF("text")
    val w = work()
    def gate(batch: DataFrame, id: Long): Unit =
      CorpusStream.curateV3GateBatch(batch, id, "url",
        s"$w/kept", s"$w/rej", s"$w/digest", s"$w/domain", s"$w/postings", s"$w/sigs",
        models.nbTokenModel, models.nbPriors, models.lmUnigrams, models.lmBigrams,
        bench, Set("en"), minAvgLpMicros = -5000000L,
        perDomain = 1, // hot.com's slot is taken by history doc 3
        digestBuckets = 4, domainBuckets = 4, postingsBuckets = 4, sigBuckets = 4,
        compactEvery = 0)
    gate(history, 0L)
    val drop = Seq(
      (10L, good, "en", "https://www.d-ten.com/10"), // exact dup of history 1
      (11L, good + " tail", "en", "https://www.d-eleven.com/11"), // near-dup of history 1
      (12L, "aa aa aa aa aa aa aa aa aa aa", "en", "https://www.d-twelve.com/12"), // low quality
      (13L, "zonk blip zork vex nim quux zonk blip zork vex nim", "zz",
        "https://www.d-thirteen.com/13"), // off label
      (14L, "bench mark answer text leaks here today", "en",
        "https://www.d-fourteen.com/14"), // contaminated
      (15L, "fresh healthy unique content about rivers and valleys flowing north", "en",
        "https://www.hot.com/15"), // domain slot consumed by history -> capped
      (16L, "another fresh healthy unique document about lakes and meadows", "en",
        "not a url"), // domainless -> inadmissible
      (17L, "fresh healthy unique content describing mountains and forests gently", "en",
        "https://www.d-seventeen.com/17")) // clean -> kept
      .toDF("doc_id", "text", "lang", "url")
    gate(drop, 1L)
    val out = routedVerdicts(spark, w, 1L).map(r => r._1 -> r._3).toMap
    assert(out(10L) == "exact_dup")
    assert(out(11L) == "near_duplicate")
    assert(out(12L) == "low_quality")
    assert(out(13L) == "off_label")
    assert(out(14L) == "contaminated")
    assert(out(15L) == "domain_capped")
    assert(out(16L) == "domain_capped")
    assert(out(17L) == "kept")
  }

  test("TTL: all four stores age out — dup re-admits, domain slot frees, never early") {
    val good = "the quick brown fox jumps over a lazy dog of the north valley"
    val trainCorpus = Seq(
      (1L, good, "en"), (2L, good + " north", "en"),
      (3L, "zonk blip zork vex nim quux zonk blip zork vex nim", "zz"))
      .toDF("doc_id", "text", "lang")
    val models = CurationArtifacts.build(trainCorpus, "doc_id", "text", "lang")
    val bench = Seq("bench mark answer text leaks here today").toDF("text")
    val w = work()
    def gate(batch: DataFrame, id: Long): Unit =
      CorpusStream.curateV3GateBatch(batch, id, "url",
        s"$w/kept", s"$w/rej", s"$w/digest", s"$w/domain", s"$w/postings", s"$w/sigs",
        models.nbTokenModel, models.nbPriors, models.lmUnigrams, models.lmBigrams,
        bench, Set("en"), minAvgLpMicros = -5000000L, perDomain = 1,
        digestBuckets = 4, domainBuckets = 4, postingsBuckets = 4, sigBuckets = 4,
        compactEvery = 2, ttlBatches = 2)
    def verdict(id: Long, batch: Long): String =
      routedVerdicts(spark, w, batch).find(_._1 == id).get._3
    // batch 0: 'good' admitted; hot.com's single slot consumed
    gate(Seq((1L, good, "en", "https://www.hist-one.com/1"),
      (3L, "hot domain filler document with plenty of unique healthy words",
        "en", "https://www.hot.com/3"))
      .toDF("doc_id", "text", "lang", "url"), 0L)
    // batch 1 (WITHIN horizon): exact dup + near dup + capped domain all gate
    gate(Seq((10L, good, "en", "https://www.d-ten.com/10"),
      (11L, good + " tail", "en", "https://www.d-eleven.com/11"),
      (15L, "fresh healthy unique content about rivers and valleys flowing north",
        "en", "https://www.hot.com/15"))
      .toDF("doc_id", "text", "lang", "url"), 1L)
    assert(verdict(10L, 1L) == "exact_dup")
    assert(verdict(11L, 1L) == "near_duplicate")
    assert(verdict(15L, 1L) == "domain_capped")
    // batches 2-3: unrelated admissions keep the stream moving (the batch-2
    // compaction at upto=2 retains origin 0: 0 > 2-1-2 holds)
    gate(Seq((30L, "completely different words describing lakes and quiet meadows",
      "en", "https://www.d-thirty.com/30")).toDF("doc_id", "text", "lang", "url"), 2L)
    gate(Seq((31L, "yet another unique document about mountains and soft winds",
      "en", "https://www.d-thirtyone.com/31")).toDF("doc_id", "text", "lang", "url"), 3L)
    // batch 4 compacts with upto=4, ttl=2: origin 0 fails 0 > 4-1-2=1 —
    // the digest, signatures, postings, AND domain count from batch 0 all
    // expire together; the same text re-admits and hot.com has a slot
    gate(Seq((20L, good, "en", "https://www.d-twenty.com/20"),
      (21L, "brand new wholesome content about gentle rain over green hills",
        "en", "https://www.hot.com/21"))
      .toDF("doc_id", "text", "lang", "url"), 4L)
    assert(verdict(20L, 4L) == "kept", "expired digest/sigs must re-admit")
    assert(verdict(21L, 4L) == "kept", "expired domain count must free the slot")
    // and the re-admissions gate the NEXT drop (sliding window)
    gate(Seq((40L, good, "en", "https://www.d-forty.com/40"),
      (41L, "one more wholesome doc about gentle rain and green hills indeed",
        "en", "https://www.hot.com/41"))
      .toDF("doc_id", "text", "lang", "url"), 5L)
    assert(verdict(40L, 5L) == "exact_dup")
    assert(verdict(41L, 5L) == "domain_capped")
  }

  test("replay of a batch id re-decides identically (exactly-once discipline)") {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val splitId = base.selectExpr("percentile(doc_id, 0.8)").head.getDouble(0).toLong
    val corpus = withUrl(base, splitId).localCheckpoint()
    val history = corpus.filter(col("doc_id") <= splitId)
    val drop = corpus.filter(col("doc_id") > splitId)
    val bench = corpus.filter(pmod(col("doc_id"), lit(97L)) === 0L).select("text")
    val models = CurationArtifacts.build(corpus, "doc_id", "text", "lang")
    val w = work()
    val gate = gateBatch(w, models, bench) _
    gate(history, 0L)
    gate(drop, 1L)
    val first = routedVerdicts(spark, w, 1L)
    def storeRows(p: String): Long = spark.read.parquet(p).count()
    val stores = Seq(s"$w/digest", s"$w/domain", s"$w/postings", s"$w/sigs")
    val counts = stores.map(storeRows)
    gate(drop, 1L) // crash-replay: same id, history excludes own deltas
    assert(routedVerdicts(spark, w, 1L) == first)
    assert(stores.map(storeRows) == counts)
  }

  test("verdicts are total and disjoint; the lifetime domain cap holds across batches") {
    val docs = (1L to 120L).map { i =>
      (i, s"healthy unique document number $i about topic ${i % 13} and subject ${i % 29}",
        "en", s"https://www.dom${i % 3}-x.com/$i")
    }.toDF("doc_id", "text", "lang", "url")
    val models = CurationArtifacts.build(docs, "doc_id", "text", "lang")
    val bench = Seq("unrelated benchmark content").toDF("text")
    val w = work()
    def gate(batch: DataFrame, id: Long): Unit =
      CorpusStream.curateV3GateBatch(batch, id, "url",
        s"$w/kept", s"$w/rej", s"$w/digest", s"$w/domain", s"$w/postings", s"$w/sigs",
        models.nbTokenModel, models.nbPriors, models.lmUnigrams, models.lmBigrams,
        bench, Set("en"), minAvgLpMicros = -5000000L, perDomain = 7,
        digestBuckets = 4, domainBuckets = 4, postingsBuckets = 4, sigBuckets = 4,
        compactEvery = 2) // exercise compaction + roll-forward mid-soak
    val batches = Seq(
      docs.filter(col("doc_id") <= 40L),
      docs.filter(col("doc_id").between(41L, 80L)),
      docs.filter(col("doc_id") > 80L))
    batches.zipWithIndex.foreach { case (b, i) => gate(b, i.toLong) }
    // totality per batch: kept ∪ rejected = batch, disjoint
    batches.zipWithIndex.foreach { case (b, i) =>
      val v = routedVerdicts(spark, w, i.toLong)
      assert(v.size == b.count())
      assert(v.map(_._1) == b.select("doc_id").as[Long].collect().toSet)
    }
    // lifetime cap: at most perDomain keeps per domain across ALL batches
    val keptByDomain = spark.read.parquet(s"$w/kept")
      .withColumn("domain",
        graft.functions.GraftUrlOps.registrableDomainCol(
          graft.functions.GraftUrlOps.urlHostCol(col("url"))))
      .groupBy("domain").count()
    assert(keptByDomain.filter(col("count") > 7).count() == 0)
    // the admitted counts survive compaction: store total ≤ 7 per domain
    val admitted = spark.read.parquet(s"$w/domain")
      .groupBy("domain").agg(sum("n_admitted").as("n"))
    assert(admitted.filter(col("n") > 7).count() == 0)
  }
}
