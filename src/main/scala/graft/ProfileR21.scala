package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r21 optimization round, not part of the driver contract):
  * phase-level timing of the bench's slowest registry entries. Wraps each
  * sub-pipeline in a job-counting listener so wall time splits into
  * "Spark job execution" vs "driver-side planning/codegen/collect" —
  * the measure-first step of the optimization guide (§1).
  */
object ProfileR21 {
  final class JobCounter extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    override def onJobStart(js: SparkListenerJobStart): Unit = {
      jobs.incrementAndGet(); starts.put(js.jobId, System.nanoTime())
    }
    override def onJobEnd(je: SparkListenerJobEnd): Unit = {
      val t0 = starts.remove(je.jobId)
      if (t0 != 0L) jobNanos.addAndGet(System.nanoTime() - t0)
    }
  }

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
      val l = new JobCounter
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give it a beat to drain
      Thread.sleep(80)
      spark.sparkContext.removeSparkListener(l)
      println(f"PHASE $name%-34s wall=$wall%7.3f s  jobs=${l.jobs.get}%3d  jobTime=${l.jobNanos.get / 1e9}%7.3f s")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    import graft.llm._
    val names = if (args.nonEmpty) args.toSet else Set("curate_v2", "minhash", "star", "ivfpq", "pca")

    if (names("curate_v2")) {
      println("== curate_v2 phases (each phase forced with count/collect) ==")
      val d = docs.select(col("doc_id"), col("text"),
        col("lang").cast("string").as("__label"))
      phase("exact md5 window") {
        d.select(col("doc_id"),
          min(col("doc_id")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text"))))
            .as("keep_id")).count()
      }
      phase("qualityScore") {
        TextAnalysis.qualityScore(d, "doc_id", "text").count()
      }
      phase("nbClassify (train+score)") {
        Classify.nbClassify(d, "doc_id", "text", "__label").count()
      }
      phase("lmScore (train+score)") {
        LangModel.lmScore(d, "doc_id", "text").count()
      }
      phase("minhashPairs") {
        Dedup.minhashPairs(d, "doc_id", "text", minJaccard = 0.5).count()
      }
      phase("minhashPairs+clustersStar") {
        Dedup.clustersStar(d.select(col("doc_id")),
          Dedup.minhashPairs(d, "doc_id", "text", minJaccard = 0.5)).count()
      }
      phase("full curateV2") {
        Curation.curateV2(docs, "doc_id", "text", "lang",
          acceptLabels = Set("en", "de", "fr")).count()
      }
    }

    if (names("minhash")) {
      println("== minhashPairs internal phases ==")
      val d = docs.select(col("doc_id"), col("text"))
      phase("sh checkpoint (shingle+sig)") {
        d.select(col("doc_id"),
          graft.functions.HashFunctions.shingleHashes(col("text"), 5).as("hs"))
          .withColumn("sig", graft.functions.HashFunctions.minhashSignature(col("hs"), 64))
          .localCheckpoint().count()
      }
    }

    if (names("ivfpq")) {
      println("== ivfpq phases ==")
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      phase("ivfPqTrain") {
        Pq.ivfPqTrain(e, "vec_id", "embedding", dim = 64, cells = 4, m = 2, k = 4)
      }
      val (coarse, pq) = Pq.ivfPqTrain(e, "vec_id", "embedding",
        dim = 64, cells = 4, m = 2, k = 4)
      phase("ivfPqEncode count") {
        Pq.ivfPqEncode(e, "vec_id", "embedding", coarse, pq).count()
      }
      phase("adaptive search (post-train)") {
        Pq.ivfPqSearchAdaptiveBatch(
          Pq.ivfPqEncode(e, "vec_id", "embedding", coarse, pq),
          coarse, pq, e.filter(col("vec_id") < 4), "vec_id", "embedding",
          candidateBudget = 150, maxProbes = 3, topK = 10).count()
      }
    }

    if (names("pca")) {
      println("== pca phases ==")
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      phase("pcaModel (train)") {
        graft.llm.Pca.pcaModel(e, "vec_id", "embedding", dim = 64, k = 8).count()
      }
      phase("pcaWhiten full") {
        graft.llm.Pca.pcaWhiten(e, "vec_id", "embedding",
          graft.llm.Pca.pcaModel(e, "vec_id", "embedding", dim = 64, k = 8)).count()
      }
    }

    if (names("rounds")) {
      println("== clustersStar round-by-round (copy of the loop, instrumented) ==")
      val d = docs.select(col("doc_id"), col("text"))
      val pairs = Dedup.minhashPairs(d, "doc_id", "text", minJaccard = 0.5)
        .localCheckpoint()
      println(s"pairs: ${pairs.count()}")
      var edges = pairs.select(
          greatest(col("doc_a"), col("doc_b")).as("hi"),
          least(col("doc_a"), col("doc_b")).as("lo"))
        .filter(col("hi") =!= col("lo"))
        .distinct()
        .localCheckpoint()
      def signature(df: org.apache.spark.sql.DataFrame): (Long, java.math.BigDecimal) = {
        val r = df.agg(count(lit(1)),
          sum(xxhash64(col("hi"), col("lo")).cast("decimal(38,0)")).cast("decimal(38,0)")).head
        (r.getLong(0), Option(r.getAs[java.math.BigDecimal](1))
          .getOrElse(java.math.BigDecimal.ZERO))
      }
      var sig = signature(edges)
      println(s"round 0: edges=${sig._1}")
      var round = 0
      var converged = sig._1 == 0
      while (!converged && round < 50) {
        val t0 = System.nanoTime()
        val nbrs = edges.select(col("hi").as("u"), col("lo").as("v"))
          .union(edges.select(col("lo").as("u"), col("hi").as("v")))
        val mins = nbrs.groupBy(col("u"))
          .agg(least(min(col("v")), first(col("u"))).as("m"))
        val large = nbrs.join(mins, "u")
          .filter(col("v") > col("u"))
          .select(col("v").as("hi"), col("m").as("lo"))
          .distinct()
        val smins = large.groupBy(col("hi").as("u")).agg(min(col("lo")).as("m"))
        val joined = large.select(col("hi").as("u"), col("lo").as("v")).join(smins, "u")
        val next = joined.select(col("u").as("hi"), col("m").as("lo"))
          .union(joined.filter(col("v") =!= col("m"))
            .select(col("v").as("hi"), col("m").as("lo")))
          .distinct()
          .localCheckpoint()
        val nextSig = signature(next)
        converged = nextSig == sig
        sig = nextSig
        edges = next
        round += 1
        println(f"round $round: edges=${sig._1}  ${(System.nanoTime() - t0) / 1e9}%6.3f s  converged=$converged")
      }
    }

    if (names("star")) {
      println("== clustersStar round cost ==")
      val d = docs.select(col("doc_id"), col("text"))
      val pairs = Dedup.minhashPairs(d, "doc_id", "text", minJaccard = 0.5)
        .localCheckpoint()
      phase("clustersStar over materialized pairs") {
        Dedup.clustersStar(d.select(col("doc_id")), pairs).count()
      }
      phase("clusters (propagation) over same pairs") {
        Dedup.clusters(d.select(col("doc_id")), pairs).count()
      }
    }

    spark.stop()
  }
}
