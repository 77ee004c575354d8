package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r22, not part of the driver contract): LARGER-SF SCALING
  * PIN — the r21 verdict's evidence gap: at sf0.1 every query is bound
  * by the ~0.1–0.3 s per-job floor (8-core ≈ 32-core for the whole
  * suite), so the bench cannot demonstrate that any operator actually
  * parallelizes. This tool scales the sf0.1 corpus ~16–32× with
  * DETERMINISTIC per-replica perturbation (per-replica character
  * rotation so replicas are NOT near-duplicates — pure replication
  * would turn the corpus into a pathological all-dup workload and
  * change the operators' character), then times the heavy operator
  * families at local[32] vs local[8] in ONE JVM (sequential sessions),
  * min-of-2 per query, with the bench's trivial-plan canary sampled per
  * session so a host window is visible in the artifact.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *          sbt 'runMain graft.llm.ScalePinR22 [docMult vecMult]'
  */
object ScalePinR22 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docMult = if (args.length >= 1) args(0).toInt else 16
    val vecMult = if (args.length >= 2) args(1).toInt else 32
    val work = "/tmp/scalepin_r22"

    def session(cpus: Int): SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", classOf[graft.functions.GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

    // ---- build the scaled inputs once (32-core session) ----
    val sb = session(32)
    sb.sparkContext.setLogLevel("ERROR")
    val alphabets = "abcdefghijklmnopqrstuvwxyz"
    def rot(i: Int): String = {
      val k = (i % 25) + 1
      alphabets.drop(k) + alphabets.take(k)
    }
    val docs0 = sb.read.parquet(s"$sfDir/documents.parquet")
    val embs0 = sb.read.parquet(s"$sfDir/embeddings.parquet")
    val docs = (0 until docMult).map { i =>
      docs0.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        (if (i == 0) col("text")
         else translate(col("text"), alphabets, rot(i))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
    val embs = (0 until vecMult).map { i =>
      embs0.select(
        (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        (if (i == 0) col("embedding")
         else transform(col("embedding"),
           x => x * (lit(1.0) + lit(i) * lit(1e-3)) + lit(i) * lit(1e-4))).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
    docs.repartition(32).write.mode("overwrite").parquet(s"$work/documents.parquet")
    embs.repartition(32).write.mode("overwrite").parquet(s"$work/embeddings.parquet")
    val nd = sb.read.parquet(s"$work/documents.parquet").count()
    val nv = sb.read.parquet(s"$work/embeddings.parquet").count()
    println(s"SCALEPIN corpus: $nd docs, $nv vecs (docMult=$docMult vecMult=$vecMult)")
    sb.stop()

    def canary(spark: SparkSession): Double = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(sum("l_quantity"), avg("l_extendedprice"), count(lit(1)))
        .count()
      (System.nanoTime() - t0) / 1e9
    }.min

    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[Int, Double]]
    Seq(32, 8).foreach { cpus =>
      val spark = session(cpus)
      spark.sparkContext.setLogLevel("ERROR")
      try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      catch { case _: Throwable => }
      val can = canary(spark)
      println(f"SESSION cpus=$cpus canary=${can * 100}%.0f cs")
      val d = spark.read.parquet(s"$work/documents.parquet")
      val e = spark.read.parquet(s"$work/embeddings.parquet")
      def time(name: String)(body: => Unit): Unit = {
        val t = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }.min
        results.getOrElseUpdate(name, scala.collection.mutable.LinkedHashMap.empty)
          .put(cpus, t)
        println(f"PIN $name%-22s cpus=$cpus%2d  min2=$t%8.2f s")
      }
      time("minhash_pairs") {
        Dedup.minhashPairs(d, "doc_id", "text", minJaccard = 0.5).count()
      }
      time("clusters_star") {
        Dedup.clustersStar(d.select(col("doc_id")),
          Dedup.minhashPairs(d, "doc_id", "text", minJaccard = 0.5)).count()
      }
      time("curate_v2") {
        Curation.curateV2(d, "doc_id", "text", "lang",
          acceptLabels = Set("en", "de", "fr")).count()
      }
      time("pca_train") {
        Pca.pcaModel(e, "vec_id", "embedding", dim = 64, k = 8).count()
      }
      time("kmeans_4iter") {
        Clustering.kmeans(e, "vec_id", "embedding", k = 8, iters = 4).count()
      }
      val can2 = canary(spark)
      println(f"SESSION cpus=$cpus canary_end=${can2 * 100}%.0f cs")
      spark.stop()
    }
    println("== scaling ratios (t8 / t32; >1 means 32 cores help) ==")
    results.foreach { case (name, m) =>
      val r = m(8) / m(32)
      println(f"RATIO $name%-22s t32=${m(32)}%8.2f  t8=${m(8)}%8.2f  ratio=$r%5.2f")
    }
  }
}
