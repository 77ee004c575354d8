package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming per-domain cap: first-arrived-wins across drops, the
  * deterministic stratifiedSample order within a drop, domainless docs
  * rejected, exactly-once under replay, and a summed compacted store. */
class DomainCapStreamSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "url")

  private def freshDirs(): (String, String, String) = {
    val root = Files.createTempDirectory("domcap")
    (s"$root/kept", s"$root/rejected", s"$root/store")
  }

  private def run(df: DataFrame, id: Long, kept: String, rej: String,
      store: String, compactEvery: Int = 0): Unit =
    CorpusStream.domainCapGateBatch(df, id, "url", kept, rej, store,
      perDomain = 3, buckets = 8, compactEvery = compactEvery)

  private def ids(path: String): Set[Long] =
    spark.read.parquet(path).select("doc_id").as[Long].collect().toSet

  test("cap holds across drops; domainless docs reject; kept ∪ rejected = batch") {
    val (kept, rej, store) = freshDirs()
    // drop 0: two docs of x.com, one of y.io, one domainless
    run(docs(
      (1L, "https://a.x.com/1"), (2L, "https://b.x.com/2"),
      (3L, "https://y.io/3"), (4L, "not a url")), 0L, kept, rej, store)
    assert(ids(kept) == Set(1L, 2L, 3L))
    assert(ids(rej) == Set(4L))

    // drop 1: three more x.com docs — only ONE slot left (cap 3)
    run(docs(
      (10L, "https://c.x.com/"), (11L, "https://d.x.com/"),
      (12L, "https://e.x.com/")), 1L, kept, rej, store)
    val keptNow = ids(kept)
    assert((keptNow -- Set(1L, 2L, 3L)).size == 1)        // exactly one admitted
    assert(ids(rej).size == 3)                            // 4 + the two over-cap

    // drop 2: x.com is full; y.io still has room
    run(docs((20L, "https://f.x.com/"), (21L, "https://z.y.io/")), 2L, kept, rej, store)
    assert(!ids(kept).contains(20L) && ids(kept).contains(21L))

    // per-domain kept totals never exceed the cap
    val byDomain = spark.read.parquet(kept).groupBy("domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain("x.com") == 3L && byDomain("y.io") == 2L)
  }

  test("TTL compaction: the cap slides — expiry never lands early") {
    val (kept, rej, store) = freshDirs()
    def runTtl(df: DataFrame, id: Long): Unit =
      CorpusStream.domainCapGateBatch(df, id, "url", kept, rej, store,
        perDomain = 2, buckets = 8, compactEvery = 2, ttlBatches = 4)
    // batch 0: x.com reaches its cap of 2
    runTtl(docs((1L, "https://a.x.com/"), (2L, "https://b.x.com/")), 0L)
    assert(ids(kept) == Set(1L, 2L))
    // batches 1..5: every x.com doc rejects — the batch-0 admissions stay
    // WITHIN the ttl=4 horizon through the compactions at 2 and 4
    // (retention keeps origin > upto-1-ttl; at upto=4: 0 > -1 holds), and
    // between compactions expired rows would still gate (conservative)
    for (b <- 1L to 5L) {
      runTtl(docs((10L + b, s"https://c$b.x.com/")), b)
      assert(!ids(kept).contains(10L + b), s"batch $b must still reject")
    }
    // batch 6 compacts with upto=6: origin 0 fails 0 > 6-1-4=1 — the
    // batch-0 admissions age OUT, and x.com has 2 fresh slots
    runTtl(docs((30L, "https://f.x.com/"), (31L, "https://g.x.com/"),
      (32L, "https://h.x.com/")), 6L)
    val now = ids(kept)
    assert(Set(30L, 31L, 32L).count(now.contains) == 2,
      s"expected exactly 2 fresh admissions after expiry, kept=$now")
    // (the batch-6 compaction expired EVERY stored row — all-expired is
    // represented as store ABSENCE, which the gate treats as empty prior)
    // batch 7: x.com full again with the fresh batch-6 admissions
    runTtl(docs((40L, "https://i.x.com/")), 7L)
    assert(!ids(kept).contains(40L))
    // batch 8 compacts: the base carries origin_batch and holds only the
    // live (batch-6) origins
    runTtl(docs((41L, "https://j.x.com/")), 8L)
    val base = spark.read.parquet(store).filter(col("batch") === -1)
    assert(base.columns.contains("origin_batch"))
    assert(base.filter(col("origin_batch") =!= 6).count() == 0)
    assert(base.filter(col("origin_batch") === 6).count() > 0)
  }

  test("TTL recovery: a committed TTL fold rolls forward like the plain one") {
    val (kept, rej, store) = freshDirs()
    def runTtl(df: DataFrame, id: Long, every: Int = 0): Unit =
      CorpusStream.domainCapGateBatch(df, id, "url", kept, rej, store,
        perDomain = 2, buckets = 8, compactEvery = every, ttlBatches = 3)
    for (b <- 0L to 3L)
      runTtl(docs((100 * b + 1, s"https://g$b.x.com/"), (100 * b + 2, "https://y.io/")), b)
    // plant the committed-fold crash state WITH the ttl filter applied
    spark.read.option("mergeSchema", "true").parquet(store)
      .filter(col("batch") < 4)
      .withColumn("origin_batch", col("batch")) // no prior base here
      .filter(col("origin_batch") > 4 - 1 - 3)
      .drop("batch")
      .groupBy(col(CorpusStream.DomainBucketCol), col("domain"), col("origin_batch"))
      .agg(sum("n_admitted").as("n_admitted"))
      .write.partitionBy(CorpusStream.DomainBucketCol)
      .parquet(s"$store/.compact_staging")
    val out = new java.io.DataOutputStream(
      new java.io.FileOutputStream(s"$store/.compact_staging/_UPTO"))
    try out.writeLong(4L) finally out.close()
    // next gated batch recovers, then decides against the recovered store
    runTtl(docs((500L, "https://z.x.com/")), 4L, every = 4)
    val dirs = new java.io.File(store).listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).toSet
    assert(dirs.contains("batch=-1") && !dirs.contains("batch=0"))
    // origins 0 aged out by the planted fold; 1..3 survive with their age
    val base = spark.read.parquet(store).filter(col("batch") === -1)
    assert(base.filter(col("origin_batch") === 0).count() == 0)
    assert(base.filter(col("origin_batch") === 1).count() > 0)
  }

  test("a crash-replayed batch re-decides identically (no double counting)") {
    val (kept, rej, store) = freshDirs()
    run(docs((1L, "https://a.x.com/"), (2L, "https://b.x.com/")), 0L, kept, rej, store)
    run(docs((10L, "https://c.x.com/"), (11L, "https://d.x.com/")), 1L, kept, rej, store)
    val keptAfter1 = ids(kept)
    val rejAfter1 = ids(rej)
    // replay batch 1 (crash before checkpoint commit): history must
    // exclude its own delta, so the decision — and the store — repeat
    run(docs((10L, "https://c.x.com/"), (11L, "https://d.x.com/")), 1L, kept, rej, store)
    assert(ids(kept) == keptAfter1 && ids(rej) == rejAfter1)
    // batch 2 sees a full x.com exactly once, not twice
    run(docs((20L, "https://e.x.com/")), 2L, kept, rej, store)
    assert(!ids(kept).contains(20L))
    assert(spark.read.parquet(kept).filter(col("domain") === "x.com").count() == 3L)
  }

  test("within-batch priority is the deterministic stratifiedSample order") {
    val (kept, rej, store) = freshDirs()
    val batch = docs((0L to 9L).map(i => (i, s"https://h$i.x.com/")): _*)
    run(batch, 0L, kept, rej, store)
    val direct = graft.llm.Mixture.stratifiedSample(
      batch.select(col("doc_id"), lit("x.com").as("domain")),
      "doc_id", "domain", perStratum = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(ids(kept) == direct)
    // and a repartitioned replay lands on the same winners
    run(batch.repartition(7), 0L, kept, rej, store)
    assert(ids(kept) == direct)
  }

  test("compaction folds deltas into a summed base without changing decisions") {
    val (kept, rej, store) = freshDirs()
    for (b <- 0L to 4L)
      run(docs((100 * b + 1, s"https://g$b.x.com/"), (100 * b + 2, "https://y.io/")),
        b, kept, rej, store, compactEvery = 2)
    // x.com saw 5 docs (cap 3), y.io saw 5 (cap 3)
    val byDomain = spark.read.parquet(kept).groupBy("domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain("x.com") == 3L && byDomain("y.io") == 3L)
    // the store has a folded base and its summed counts equal the kept rows
    val dirs = new java.io.File(store).listFiles().map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(dirs.contains("batch=-1"))
    val totals = spark.read.parquet(store).groupBy("domain")
      .agg(sum("n_admitted").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals == byDomain)
  }

  // --- compaction crash recovery: the summed store must neither lose ---
  // --- nor double-count a delta, whatever step the crash interrupted ---

  /** Build a store with batches 0..3 (uncompacted) and return the
    * per-domain kept truth the store must keep matching. */
  private def storeWithFourBatches(): (String, String, String, Map[String, Long]) = {
    val (kept, rej, store) = freshDirs()
    for (b <- 0L to 3L)
      run(docs((100 * b + 1, s"https://g$b.x.com/"), (100 * b + 2, "https://y.io/")),
        b, kept, rej, store)
    val truth = spark.read.parquet(kept).groupBy("domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (kept, rej, store, truth)
  }

  private def storeTotals(store: String): Map[String, Long] =
    spark.read.parquet(store).groupBy("domain")
      .agg(sum("n_admitted").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Write the committed-fold crash state by hand: a staging dir holding
    * the fold of batches < upto plus the _UPTO manifest — exactly what a
    * crash right after the commit point leaves behind. */
  private def plantCommittedStaging(store: String, upto: Long): Unit = {
    spark.read.parquet(store).filter(col("batch") < upto).drop("batch")
      .groupBy(col(CorpusStream.DomainBucketCol), col("domain"))
      .agg(sum("n_admitted").as("n_admitted"))
      .write.partitionBy(CorpusStream.DomainBucketCol)
      .parquet(s"$store/.compact_staging")
    val out = new java.io.DataOutputStream(
      new java.io.FileOutputStream(s"$store/.compact_staging/_UPTO"))
    try out.writeLong(upto) finally out.close()
  }

  private def deleteDir(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(path))
  }

  test("recovery: committed staging with partially-deleted deltas rolls forward") {
    val (_, _, store, truth) = storeWithFourBatches()
    plantCommittedStaging(store, 4L)
    deleteDir(s"$store/batch=1") // crash interrupted the delete loop here
    // next compaction call (any upto) must finish the committed fold:
    // batch=1's counts live ONLY in the staging now — discarding it
    // would lose them; folding batch=0/2/3 again would double them.
    CorpusStream.compactBucketedStore(spark, store,
      CorpusStream.DomainBucketCol, 4L,
      fold = df => df.groupBy(col(CorpusStream.DomainBucketCol), col("domain"))
        .agg(sum("n_admitted").as("n_admitted")))
    assert(storeTotals(store) == truth)
    val dirs = new java.io.File(store).listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).toSet
    assert(dirs == Set("batch=-1"))
  }

  test("recovery: uncommitted staging is discarded and deltas survive intact") {
    val (_, _, store, truth) = storeWithFourBatches()
    // staging WITHOUT _UPTO: the fold write crashed before the commit
    // point, so all batch dirs are still on disk — recompute from them
    spark.read.parquet(store).filter(col("batch") < 2).drop("batch")
      .write.partitionBy(CorpusStream.DomainBucketCol)
      .parquet(s"$store/.compact_staging")
    CorpusStream.compactBucketedStore(spark, store,
      CorpusStream.DomainBucketCol, 4L,
      fold = df => df.groupBy(col(CorpusStream.DomainBucketCol), col("domain"))
        .agg(sum("n_admitted").as("n_admitted")))
    assert(storeTotals(store) == truth)
  }

  test("recovery: crash after all deletes but before the base swap finishes") {
    val (_, _, store, truth) = storeWithFourBatches()
    plantCommittedStaging(store, 4L)
    for (b <- 0L to 3L) deleteDir(s"$store/batch=$b")
    CorpusStream.compactBucketedStore(spark, store,
      CorpusStream.DomainBucketCol, 4L)
    assert(storeTotals(store) == truth)
  }

  test("recovery happens through the gate itself and decisions stay correct") {
    val (kept, rej, store, _) = storeWithFourBatches() // x.com full at 3
    plantCommittedStaging(store, 4L)
    deleteDir(s"$store/batch=2")
    // batch 4 (compactEvery=4 → compaction runs first, recovering) must
    // still see x.com at its cap — not under (lost delta) or over
    run(docs((400L, "https://h.x.com/"), (401L, "https://w.z.dev/")),
      4L, kept, rej, store, compactEvery = 4)
    assert(!ids(kept).contains(400L)) // x.com full: count survived the crash
    assert(ids(kept).contains(401L)) // fresh domain unaffected
    assert(storeTotals(store)("x.com") == 3L)
  }

  test("the sink end-to-end over a two-drop file stream matches direct batches") {
    val root = Files.createTempDirectory("domcapstream")
    val in = s"$root/in"
    val (kept, rej, store) = (s"$root/kept", s"$root/rej", s"$root/store")
    val ckpt = s"$root/ckpt"

    def drop(rows: Seq[(Long, String)], name: String): Unit =
      rows.toDF("doc_id", "url").coalesce(1)
        .write.mode("append").parquet(in)

    drop(Seq((1L, "https://a.x.com/"), (2L, "https://b.x.com/"),
      (3L, "https://c.x.com/"), (4L, "https://d.x.com/")), "d0")
    val schema = "doc_id LONG, url STRING"
    def runStream(): Unit = {
      val q = CorpusStream.domainCapGateSink(
        spark.readStream.schema(schema).parquet(in),
        "url", kept, rej, store, ckpt, perDomain = 3).start()
      q.awaitTermination(120000)
    }
    runStream()
    assert(ids(kept).size == 3 && ids(rej).size == 1)
    drop(Seq((10L, "https://e.x.com/"), (11L, "https://w.y.io/")), "d1")
    runStream()
    assert(ids(kept).size == 4 && ids(kept).contains(11L) && !ids(kept).contains(10L))
  }
}
