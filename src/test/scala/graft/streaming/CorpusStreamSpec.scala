package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The streaming near-dup gate must implement exactly the batch dedup
  * semantics it composes: in-batch MinHash clustering to one
  * representative, then the bipartite incremental check against the
  * signature store of everything previously kept — idempotent under
  * crash-replay of a batch. */
class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val other = "completely different content with zero overlapping shingles here"

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'web' AS source",
        "CAST(length(text) AS LONG) AS n_chars")

  private def freshDirs(): (String, String) = {
    val root = Files.createTempDirectory("neardup-gate")
    (s"$root/corpus", s"$root/store")
  }

  private def runBatch(df: DataFrame, id: Long, corpus: String, store: String): Unit =
    CorpusStream.nearDupGateBatch(df, id, corpus, store,
      shingleK = 5, perms = 64, nBands = 16, rowsPerBand = 4, minJaccard = 0.5)

  test("gate keeps cluster representatives and rejects history near-dups") {
    val (corpus, store) = freshDirs()
    // batch 0: 2 is a near-dup of 1 (in-batch collapse); 3 is unique
    runBatch(docs(1L -> base, 2L -> base.replace("today", "tonite"), 3L -> other), 0L, corpus, store)
    assert(CorpusStream.readKept(spark, corpus).select("doc_id").as[Long].collect().toSet
      == Set(1L, 3L))
    // batch 1: 10 near-dups HISTORY (doc 1) -> rejected; 11 unique -> kept;
    // 12 near-dups 11 in-batch -> collapsed into 11
    val novel = "entirely novel passage speaking about completely unrelated topics indeed"
    runBatch(docs(
      10L -> base.replace("today", "tomoro"),
      11L -> novel,
      12L -> novel.replace("indeed", "inword")), 1L, corpus, store)
    assert(CorpusStream.readKept(spark, corpus).select("doc_id").as[Long].collect().toSet
      == Set(1L, 3L, 11L))
    // the store holds signatures for exactly the kept docs
    assert(spark.read.parquet(store).select("doc_id").as[Long].collect().toSet
      == Set(1L, 3L, 11L))
  }

  test("a crash-replayed batch lands on identical results") {
    val (corpus, store) = freshDirs()
    runBatch(docs(1L -> base, 3L -> other), 0L, corpus, store)
    val b1 = docs(10L -> base.replace("today", "tomoro"), 11L -> "some wholly fresh text body")
    runBatch(b1, 1L, corpus, store)
    val firstKept = CorpusStream.readKept(spark, corpus)
      .select("doc_id").as[Long].collect().toSet
    runBatch(b1, 1L, corpus, store) // replay: must exclude its own partial output
    assert(CorpusStream.readKept(spark, corpus).select("doc_id").as[Long].collect().toSet
      == firstKept)
    assert(firstKept == Set(1L, 3L, 11L))
    assert(spark.read.parquet(store).filter(col("batch") === 1).count() == 1) // just 11
  }

  test("the sink end-to-end over a two-drop file stream matches the direct batches") {
    val (corpus, store) = freshDirs()
    val dropDir = Files.createTempDirectory("drops")
    docs(1L -> base, 2L -> base.replace("today", "tonite"), 3L -> other)
      .coalesce(1).write.parquet(s"$dropDir/d0")
    // file source lists files, not dirs: flatten the part files into dropDir
    val fs = new org.apache.hadoop.fs.Path(dropDir.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    var n = 0
    for (d <- Seq("d0")) {
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dropDir/$d"))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .foreach { f =>
          fs.rename(f.getPath, new org.apache.hadoop.fs.Path(s"$dropDir/drop_$n.parquet")); n += 1
        }
      fs.delete(new org.apache.hadoop.fs.Path(s"$dropDir/$d"), true)
    }
    val checkpoint = Files.createTempDirectory("ckpt").toString
    val stream = spark.readStream.schema(CorpusStream.documentsSchema)
      .parquet(dropDir.toString)
    val q = CorpusStream.nearDupGateSink(stream, corpus, store, checkpoint).start()
    q.awaitTermination(120000)
    assert(CorpusStream.readKept(spark, corpus).select("doc_id").as[Long].collect().toSet
      == Set(1L, 3L))
    // second drop arrives; AvailableNow catches up from the checkpoint
    docs(10L -> base.replace("today", "tomoro"), 11L -> "some wholly fresh text body")
      .coalesce(1).write.parquet(s"$dropDir/d1")
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$dropDir/d1"))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach { f =>
        fs.rename(f.getPath, new org.apache.hadoop.fs.Path(s"$dropDir/drop_$n.parquet")); n += 1
      }
    fs.delete(new org.apache.hadoop.fs.Path(s"$dropDir/d1"), true)
    val q2 = CorpusStream.nearDupGateSink(stream, corpus, store, checkpoint).start()
    q2.awaitTermination(120000)
    assert(CorpusStream.readKept(spark, corpus).select("doc_id").as[Long].collect().toSet
      == Set(1L, 3L, 11L))
  }

  test("score gate routes by trained classifier label and LM floor; replay is idempotent") {
    import graft.llm.{Classify, LangModel}
    // train on a reference corpus where labels follow disjoint vocab
    val ref = Seq(
      (1L, "good text about tables and rows", "keep"),
      (2L, "good text about rows and values", "keep"),
      (3L, "zz qq spam spam spam zz", "drop"),
      (4L, "qq zz spam zz qq spam", "drop")).toDF("doc_id", "text", "lang")
    val nbM = Classify.nbTrain(ref, "doc_id", "text", "lang")
    val nbP = Classify.nbPriors(ref, "lang")
    val lmU = LangModel.lmUnigrams(ref, "doc_id", "text")
    val lmB = LangModel.lmBigrams(ref, "doc_id", "text")
    val root = Files.createTempDirectory("score-gate")
    val (kept, rejected) = (s"$root/kept", s"$root/rejected")
    def gate(df: DataFrame, id: Long): Unit =
      CorpusStream.scoreGateBatch(df, id, kept, rejected, nbM, nbP, lmU, lmB,
        acceptLabels = Set("keep"), minAvgLpMicros = -3500000L)
    // 20 looks like 'keep' vocab; 21 like 'drop'; 22 is OOV gibberish
    // (classifies by priors alone -> smallest-label tiebreak risk is
    // avoided: priors are equal, so 'drop' < 'keep' wins -> rejected)
    val b0 = docs(20L -> "good text about tables and values",
      21L -> "spam zz qq spam", 22L -> "xxxx yyyy zzzz wwww")
    gate(b0, 0L)
    def ids(path: String) = spark.read.parquet(path).select("doc_id").as[Long].collect().toSet
    assert(ids(kept) == Set(20L))
    assert(ids(rejected) == Set(21L, 22L))
    // the decision matches scoring the same batch directly
    val direct = LangModel.lmScoreWith(
      Classify.nbScoreWith(b0, "doc_id", "text", nbM, nbP, passThrough = Seq("text")),
      "doc_id", "text", lmU, lmB, passThrough = Seq("predicted_label"))
      .select(col("doc_id"),
        (col("predicted_label") === "keep" &&
          col("lp_micros") >= lit(-3500000L) * col("n_pairs")).as("pass"))
      .as[(Long, Boolean)].collect().toMap
    assert(direct(20L) && !direct(21L) && !direct(22L))
    // crash-replay of batch 0 lands identically (per-batch dir overwrite)
    gate(b0, 0L)
    assert(ids(kept) == Set(20L) && ids(rejected) == Set(21L, 22L))
    // second batch appends its own dir
    gate(docs(30L -> "good text about tables and rows and values"), 1L)
    assert(ids(kept) == Set(20L, 30L))
  }

  test("bucketed gate decides identically to the single-store gate and prunes partitions") {
    val (corpusA, storeA) = freshDirs()
    val rootB = Files.createTempDirectory("neardup-bucketed")
    val (corpusB, postingsB, storeB) = (s"$rootB/corpus", s"$rootB/postings", s"$rootB/store")
    def runBucketed(df: DataFrame, id: Long): Unit =
      CorpusStream.nearDupGateBucketedBatch(df, id, corpusB, postingsB, storeB,
        shingleK = 5, perms = 64, nBands = 16, rowsPerBand = 4, minJaccard = 0.5,
        postingsBuckets = 16, sigBuckets = 8)
    // drop 1: two near-dups + one distinct; drop 2: a history near-dup,
    // an in-batch pair, and a fresh doc; drop 3: replay of drop 2
    val d1 = docs(1L -> base, 2L -> (base + " x"), 3L -> other)
    val d2 = docs(11L -> (base + " y"), 12L -> (other + " almost same tail z"),
      13L -> (other + " almost same tail z w"), 14L -> "entirely new content nothing shared")
    for ((df, id) <- Seq((d1, 0L), (d2, 1L))) {
      runBatch(df, id, corpusA, storeA)
      runBucketed(df, id)
    }
    def kept(p: String) = CorpusStream.readKept(spark, p)
      .select("doc_id").as[Long].collect().toSet
    assert(kept(corpusB) == kept(corpusA), "bucketed gate diverged from single-store")
    // crash-replay of batch 1 is idempotent
    runBucketed(d2, 1L)
    assert(kept(corpusB) == kept(corpusA))
    // partition pruning is REAL: a pruned postings read selects fewer
    // hive partitions than the store holds
    val post = spark.read.parquet(postingsB)
    val allParts = selectedPartitions(post)
    val somePruned = selectedPartitions(
      post.filter(col(CorpusStream.PostingsBucketCol).isin(0, 1)))
    assert(somePruned < allParts,
      s"bucket filter did not prune ($somePruned vs $allParts partitions)")
    val sig = spark.read.parquet(storeB)
    assert(selectedPartitions(
      sig.filter(col(CorpusStream.SigBucketCol) === 0)) < selectedPartitions(sig))
    // and the pruned read path is what the gate itself issues: a 1-doc
    // drop touches at most nBands postings buckets of the 16
    val d3 = docs(21L -> "one more unique doc to measure touched buckets")
    runBucketed(d3, 2L)
    assert(kept(corpusB) == kept(corpusA) + 21L)
  }

  private def selectedPartitions(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }.sum

  test("bucketed gate TTL: history near-dups gate within horizon, expire after") {
    val root = Files.createTempDirectory("neardup-ttl")
    val (corpus, postings, store) = (s"$root/corpus", s"$root/postings", s"$root/store")
    def run(df: DataFrame, id: Long): Unit =
      CorpusStream.nearDupGateBucketedBatch(df, id, corpus, postings, store,
        shingleK = 5, perms = 64, nBands = 16, rowsPerBand = 4, minJaccard = 0.5,
        postingsBuckets = 16, sigBuckets = 8, compactEvery = 2, ttlBatches = 3)
    def kept = CorpusStream.readKept(spark, corpus)
      .select("doc_id").as[Long].collect().toSet
    // batch 0: the original is kept
    run(docs(1L -> base), 0L)
    assert(kept == Set(1L))
    // batches 1..3: near-dups of it reject — the batch-0 signature stays
    // within the ttl=3 horizon through the compaction at 2
    // (0 > 2-1-3 holds) and, between compactions, via the batch dirs
    for (b <- 1L to 3L) {
      run(docs((10L + b) -> (base + " v" + b)), b)
      assert(!kept.contains(10L + b), s"batch $b must still reject the near-dup")
    }
    // batch 4 compacts with upto=4: origin 0 fails 0 > 4-1-3=0 — the
    // signature expires and the same text is ADMITTED again
    run(docs(20L -> (base + " revisited")), 4L)
    assert(kept.contains(20L), "expired near-dup history must re-admit")
    // and the fresh admission gates the NEXT drop (sliding window)
    run(docs(21L -> (base + " revisited again")), 5L)
    assert(!kept.contains(21L))
  }

  test("NULL-text docs route to rejected, never silently vanish") {
    import graft.llm.{Classify, LangModel}
    val ref = Seq(
      (1L, "good text about tables and rows", "keep"),
      (2L, "good text about rows and values", "keep")).toDF("doc_id", "text", "lang")
    val nbM = Classify.nbTrain(ref, "doc_id", "text", "lang")
    val nbP = Classify.nbPriors(ref, "lang")
    val lmU = LangModel.lmUnigrams(ref, "doc_id", "text")
    val lmB = LangModel.lmBigrams(ref, "doc_id", "text")
    val root = Files.createTempDirectory("null-text")
    // doc 51 has NULL text: its prior-argmax label IS the accept label
    // and its LM score is the vacuous (0, 0) — so without the explicit
    // NULL policy it would pass both gates; the policy sends it to
    // REJECTED, and routing stays total (kept ∪ rejected = batch)
    val b = Seq((50L, "good text about tables"), (51L, null: String))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'web' AS source",
        "CAST(coalesce(length(text), 0) AS LONG) AS n_chars")
    CorpusStream.scoreGateBatch(b, 0L, s"$root/kept", s"$root/rejected",
      nbM, nbP, lmU, lmB, acceptLabels = Set("keep"), minAvgLpMicros = -3500000L)
    def ids(p: String) = spark.read.parquet(p).select("doc_id").as[Long].collect().toSet
    assert(ids(s"$root/kept") == Set(50L))
    assert(ids(s"$root/rejected") == Set(51L))
    // and the scorers themselves emit the oracle's NULL-text rows
    // (prior-argmax label; n_pairs = 0, lp_micros = 0), not NULLs
    val scored = LangModel.lmScoreWith(
      Classify.nbScoreWith(b, "doc_id", "text", nbM, nbP, passThrough = Seq("text")),
      "doc_id", "text", lmU, lmB, passThrough = Seq("predicted_label"))
      .where(col("doc_id") === 51L)
      .select("predicted_label", "n_pairs", "lp_micros")
      .as[(String, Long, Long)].collect()
    assert(scored.toSeq == Seq(("keep", 0L, 0L)))
  }

  test("an LM floor rejects improbable token sequences even for the accepted label") {
    import graft.llm.{Classify, LangModel}
    val ref = Seq(
      (1L, "alpha beta alpha beta alpha beta", "keep"),
      (2L, "alpha beta alpha beta", "keep")).toDF("doc_id", "text", "lang")
    val nbM = Classify.nbTrain(ref, "doc_id", "text", "lang")
    val nbP = Classify.nbPriors(ref, "lang")
    val lmU = LangModel.lmUnigrams(ref, "doc_id", "text")
    val lmB = LangModel.lmBigrams(ref, "doc_id", "text")
    val root = Files.createTempDirectory("lm-floor")
    // (beta,alpha)/(alpha,beta) observed; (beta,beta)/(alpha,alpha) only
    // have the smoothed fallback -> a scrambled doc scores far lower
    CorpusStream.scoreGateBatch(
      docs(40L -> "alpha beta alpha beta", 41L -> "beta beta beta alpha alpha"),
      0L, s"$root/kept", s"$root/rejected", nbM, nbP, lmU, lmB,
      acceptLabels = Set("keep"), minAvgLpMicros = -800000L)
    assert(spark.read.parquet(s"$root/kept").select("doc_id").as[Long].collect().toSet
      == Set(40L))
    assert(spark.read.parquet(s"$root/rejected").select("doc_id").as[Long].collect().toSet
      == Set(41L))
  }

  test("decontamination gate rejects embedding-space eval leakage; replay is idempotent") {
    val bench = Seq((100L, Seq(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("doc_id", "embedding")
    def drop(rows: (Long, Seq[Float])*): DataFrame =
      rows.toDF("doc_id", "embedding")
        .selectExpr("doc_id", "embedding", "'web' AS source")
    val root = Files.createTempDirectory("decontam-gate")
    val (kept, rejected) = (s"$root/kept", s"$root/rejected")
    def gate(df: DataFrame, id: Long): Unit =
      CorpusStream.decontamGateBatch(df, id, kept, rejected, bench,
        nPlanes = 2, minCosine = 0.9, multiprobe = 1)
    // 1 is a paraphrase-level copy (scaled), 2 is orthogonal, 3 has zero
    // norm (excluded from the check -> kept, nothing to compare)
    gate(drop(
      1L -> Seq(3.0f, 0.1f, 0.0f, 0.0f),
      2L -> Seq(0.0f, 1.0f, 0.0f, 0.0f),
      3L -> Seq(0.0f, 0.0f, 0.0f, 0.0f)), 0L)
    def ids(path: String) = spark.read.parquet(path).select("doc_id").as[Long].collect().toSet
    assert(ids(kept) == Set(2L, 3L))
    assert(ids(rejected) == Set(1L))
    // data columns ride through both routes (+ the hive batch id)
    assert(spark.read.parquet(kept).columns.toSet ==
      Set("doc_id", "embedding", "source", "batch"))
    // crash-replay of batch 0 lands identically
    gate(drop(1L -> Seq(3.0f, 0.1f, 0.0f, 0.0f), 2L -> Seq(0.0f, 1.0f, 0.0f, 0.0f),
      3L -> Seq(0.0f, 0.0f, 0.0f, 0.0f)), 0L)
    assert(ids(kept) == Set(2L, 3L) && ids(rejected) == Set(1L))
    // second batch appends its own dir; benchmark state never grows
    gate(drop(10L -> Seq(0.99f, 0.01f, 0.0f, 0.0f), 11L -> Seq(0.0f, 0.0f, 1.0f, 0.0f)), 1L)
    assert(ids(rejected) == Set(1L, 10L) && ids(kept) == Set(2L, 3L, 11L))
  }
}
