package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r22 optimization round, not part of the driver contract):
  * phase-level wall/job-count profiling of the r21-verdict "unprofiled
  * tail" — minhashPairs internals, bm25/tfidf, ngram pairs, incremental
  * minhash, PCA moments, BPE — the measure-first step of the guide (§1)
  * before touching any of them. */
object ProfileR22 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", classOf[graft.functions.GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => }

    def phase(name: String)(body: => Unit): Unit = {
      val l = new graft.ProfileR21.JobCounter
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(80)
      spark.sparkContext.removeSparkListener(l)
      println(f"PHASE $name%-38s wall=$wall%7.3f s  jobs=${l.jobs.get}%3d  jobTime=${l.jobNanos.get / 1e9}%7.3f s")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    
    val names = if (args.nonEmpty) args.toSet
      else Set("minhash", "bm25", "ngram", "incr", "pca", "bpe")

    if (names("minhash")) {
      println("== minhashPairs internal phases (each forced with count) ==")
      val d = docs.select(col("doc_id"), col("text"))
      val perms = 64; val nBands = 16; val rowsPerBand = 4
      def shDf = d.select(col("doc_id"),
          graft.functions.HashFunctions.shingleHashes(col("text"), 5).as("hs"))
        .withColumn("sig", graft.functions.HashFunctions.minhashSignature(col("hs"), perms))
      phase("sh checkpoint (shingle+sig)") { shDf.localCheckpoint().count() }
      val sh = shDf.localCheckpoint()
      def pairsDf = Dedup.bucketPairs(
        sh.select(col("doc_id"),
            explode(TextHash.bandDigests(col("sig"), nBands, rowsPerBand)).as("bd"))
          .select(col("doc_id"), col("bd.band").as("band"), col("bd.band_hash").as("band_hash"))
          .groupBy(col("band"), col("band_hash"))
          .agg(collect_list(col("doc_id")).as("ids")),
        Dedup.MaxBucket,
        (x, y) => struct(x.as("doc_a"), y.as("doc_b")))
        .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
        .distinct()
      phase("pairs checkpoint (band+bucket)") { pairsDf.localCheckpoint().count() }
      val pairsM = pairsDf.localCheckpoint()
      def shCandDf = sh.join(
        pairsM.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id")).distinct(),
        Seq("doc_id"), "left_semi")
      phase("shCand checkpoint (semi)") { shCandDf.localCheckpoint().count() }
      val shCand = shCandDf.localCheckpoint()
      val minAgree = math.ceil((0.5 - 0.15) * perms).toInt
      phase("screen+verify joins") {
        pairsM
          .join(shCand.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
          .join(shCand.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
          .filter(graft.functions.HashFunctions.sigAgreement(col("sig_a"), col("sig_b")) >= minAgree)
          .select(col("doc_a"), col("doc_b"))
          .join(shCand.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), Seq("doc_a"))
          .join(shCand.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), Seq("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            graft.functions.HashFunctions.jaccardLong(col("hs_a"), col("hs_b")).as("jaccard"))
          .filter(col("jaccard") >= 0.5)
          .count()
      }
      phase("full minhashPairs") {
        Dedup.minhashPairs(d, "doc_id", "text", minJaccard = 0.5).count()
      }
    }

    if (names("bm25")) {
      println("== bm25 / tfidf phases ==")
      val terms = Seq("table", "stream", "hash", "vector") // = LlmQueries.Bm25QueryTerms
      phase("bm25TopK") {
        Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 20, logIdf = false).count()
      }
      phase("invertedIndex") {
        Retrieval.invertedIndex(docs, "doc_id", "text").count()
      }
      phase("bm25 postings (pre-filtered)") {
        docs.select(col("doc_id"),
            TextHash.bindOnce(TextHash.wordTokens(col("text")), t =>
              struct(size(t).as("dl"),
                filter(t, tok => tok.isin(terms: _*)).as("toks"))).as("s"))
          .select(col("doc_id"), col("s.dl").as("dl"), explode(col("s.toks")).as("token"))
          .groupBy("token", "doc_id")
          .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))
          .count()
      }
      phase("corpusStats") {
        Retrieval.corpusStats(docs, "doc_id", "text").count()
      }
      phase("tfidf") {
        Retrieval.tfidf(docs, "doc_id", "text", logIdf = false).count()
      }
    }

    if (names("ngram")) {
      println("== ngramJaccardPairs ==")
      phase("ngramJaccardPairs") {
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.5).count()
      }
    }

    if (names("incr")) {
      println("== minhashIncrementalPairs ==")
      phase("minhashIncrementalPairs") {
        Dedup.minhashIncrementalPairs(
          docs.filter(col("doc_id") >= 250), docs.filter(col("doc_id") < 250),
          "doc_id", "text",
          shingleK = 5, perms = 64, nBands = 16, rowsPerBand = 4, minJaccard = 0.5).count()
      }
    }

    if (names("pca")) {
      println("== pca moment phases ==")
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      phase("state (explode+groupBy i,j)") {
        Pca.state(e, "embedding", dim = 64).count()
      }
      phase("pcaModel (moments+jacobi)") {
        Pca.pcaModel(e, "vec_id", "embedding", dim = 64, k = 8).count()
      }
      phase("explode only (noop-agg)") {
        e.filter(col("embedding").isNotNull)
          .select(transform(Similarity.asDouble(col("embedding")),
            x => round(x * 1e6).cast("long")).as("q"))
          .select(explode(graft.functions.HashFunctions.pcaMoments(col("q"), 64)).as("c"))
          .select(count(lit(1))).count()
      }
    }

    if (names("bpe")) {
      println("== bpe phases ==")
      phase("bpe train") {
        Bpe.trainDf(docs, "doc_id", "text", merges = 8, maxWords = 1000).count()
      }
      phase("bpe encode (post-train)") {
        Bpe.encode(docs, "doc_id", "text",
          Bpe.train(docs, "doc_id", "text", merges = 8, maxWords = 1000)).count()
      }
    }

    spark.stop()
  }
}
