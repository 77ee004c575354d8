package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: phase-level timing of the composite curation/cluster
  * operators (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    t("warmup count")(docs.count())
    val scores = t("qualityScore")(
      graft.llm.TextAnalysis.qualityScore(docs, "doc_id", "text")
        .select("doc_id", "quality_score").localCheckpoint())
    val passing = docs.select(col("doc_id"), col("text"))
      .join(scores.filter(col("quality_score") >= 0.4).select("doc_id"), Seq("doc_id"))
    val sh = t("shingleHashes checkpoint")(
      docs.select(col("doc_id"),
        graft.functions.HashFunctions.shingleHashes(col("text"), 5).as("hs"))
        .localCheckpoint())
    t("minhash signature only")(
      sh.select(col("doc_id"),
        graft.functions.HashFunctions.minhashSignature(col("hs"), 64).as("sig"))
        .count())
    t("banded+bucket count") {
      import graft.functions.HashFunctions
      import graft.llm.TextHash._
      val banded = sh.select(col("doc_id"),
        explode(bindOnce(
          HashFunctions.minhashSignature(col("hs"), 64),
          sig => bandDigests(sig, 16, 4))).as("bd"))
        .select(col("doc_id"), col("bd.band").as("band"), col("bd.band_hash").as("band_hash"))
      val buckets = banded.groupBy(col("band"), col("band_hash"))
        .agg(collect_list(col("doc_id")).as("ids"))
      val cand = buckets.filter(size(col("ids")).between(2, 64))
        .select(explode(flatten(transform(col("ids"), x =>
          transform(filter(col("ids"), y => y > x), y => struct(x.as("a"), y.as("b")))))).as("p"))
        .select("p.a", "p.b").distinct()
      println(s"  candidate pairs: ${cand.count()}")
    }
    val pairs = t("minhashPairs build+count") {
      val p = graft.llm.Dedup.minhashPairs(passing, "doc_id", "text")
      p.count(); p
    }
    t("clusters") {
      // inline copy of Dedup.clusters with per-round timing
      val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      val e2 = t("  edges checkpoint")(edges.localCheckpoint())
      var labels = t("  labels init")(
        passing.select(col("doc_id"), col("doc_id").as("cluster_id")).localCheckpoint())
      var prev = labels.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head.getDecimal(0)
      var round = 0
      var converged = false
      while (!converged && round < 100) {
        val next = t(s"  round $round") {
          val viaEdges = e2
            .join(labels.withColumnRenamed("doc_id", "dst2"), col("dst") === col("dst2"))
            .select(col("src").as("doc_id"), col("cluster_id"))
          labels.select(col("doc_id"), col("cluster_id"))
            .union(viaEdges).groupBy("doc_id")
            .agg(min("cluster_id").as("cluster_id")).localCheckpoint()
        }
        val s = next.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head.getDecimal(0)
        converged = s.compareTo(prev) == 0
        prev = s; labels = next; round += 1
      }
      println(s"  rounds: $round")
      labels.count()
    }
    t("curate e2e")(graft.llm.Curation.curate(docs, "doc_id", "text").count())
    spark.stop()
  }
}
