package graft.llm

import graft.functions.HashFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import TextHash._

/** Dev tool (r21 optimization round): INTRA-SESSION A/B of candidate
  * optimizations — both variants run alternately in one JVM/session so
  * host-window drift (BASELINE.md's measured 2-2.7x same-plan dispersion)
  * cancels out. Not part of the driver contract. */
object ProfileAbR21 {
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def minOf(n: Int)(body: => Unit): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min

    // ---------------- A/B 1: two-stage (in-code) vs fused screen+verify --
    // (r21 decision record: the fused form measured slower — kept here so
    // the comparison can be re-run in one session)
    def fusedPairs(d: DataFrame): DataFrame = {
      val (perms, nBands, rowsPerBand, minJaccard, maxBucket, estSlack) =
        (64, 16, 4, 0.5, Dedup.MaxBucket, 0.15)
      val sh = d
        .select(col("doc_id"), HashFunctions.shingleHashes(col("text"), 5).as("hs"))
        .withColumn("sig", HashFunctions.minhashSignature(col("hs"), perms))
        .localCheckpoint()
      val banded = sh
        .select(col("doc_id"), explode(bandDigests(col("sig"), nBands, rowsPerBand)).as("bd"))
        .select(col("doc_id"), col("bd.band").as("band"), col("bd.band_hash").as("band_hash"))
      val pairs = Dedup.bucketPairs(
        banded.groupBy(col("band"), col("band_hash"))
          .agg(collect_list(col("doc_id")).as("ids")),
        maxBucket,
        (x, y) => struct(x.as("doc_a"), y.as("doc_b")))
        .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
        .distinct()
      val minAgree = math.ceil((minJaccard - estSlack) * perms).toInt
      val pairsM = pairs.localCheckpoint()
      val shCand = sh
        .join(
          pairsM.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id")).distinct(),
          Seq("doc_id"), "left_semi")
        .localCheckpoint()
      pairsM
        .join(shCand.select(col("doc_id").as("doc_a"),
          col("sig").as("sig_a"), col("hs").as("hs_a")), Seq("doc_a"))
        .join(shCand.select(col("doc_id").as("doc_b"),
          col("sig").as("sig_b"), col("hs").as("hs_b")), Seq("doc_b"))
        .filter(HashFunctions.sigAgreement(col("sig_a"), col("sig_b")) >= minAgree)
        .select(col("doc_a"), col("doc_b"),
          HashFunctions.jaccardLong(col("hs_a"), col("hs_b")).as("jaccard"))
        .filter(col("jaccard") >= minJaccard)
    }
    val d = docs.select(col("doc_id"), col("text"))
    // alternate to cancel window drift
    val (twoT, fusedT) = (
      minOf(5)(Dedup.minhashPairs(d, "doc_id", "text", minJaccard = 0.5).count()),
      minOf(5)(fusedPairs(d).count()))
    println(f"AB1 minhashPairs  two-stage(in-code)=$twoT%6.3f s  fused=$fusedT%6.3f s")

    // ---------------- A/B 2: observe-loop vs two-job loop (propagation) --
    def clustersTwoJob(docsIds: DataFrame, pairs: DataFrame, maxRounds: Int = 100): DataFrame = {
      val p = pairs.select(col("doc_a"), col("doc_b")).localCheckpoint()
      val edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      var labels = edges.select(col("src").as("doc_id")).distinct()
        .select(col("doc_id"), col("doc_id").as("cluster_id")).localCheckpoint()
      def labelSum(df: DataFrame): java.math.BigDecimal = {
        val s = df.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head
          .getAs[java.math.BigDecimal](0)
        if (s == null) java.math.BigDecimal.ZERO else s
      }
      var prevSum = labelSum(labels)
      var round = 0
      var converged = false
      while (!converged && round < maxRounds) {
        val viaEdges = edges
          .join(labels.withColumnRenamed("doc_id", "dst2"), col("dst") === col("dst2"))
          .select(col("src").as("doc_id"), col("cluster_id"))
        val next = labels.select(col("doc_id"), col("cluster_id"))
          .union(viaEdges)
          .groupBy("doc_id")
          .agg(min("cluster_id").as("cluster_id"))
          .localCheckpoint()
        val nextSum = labelSum(next)
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        labels = next
        round += 1
      }
      docsIds.select(col("doc_id"))
        .join(labels.withColumnRenamed("cluster_id", "edge_cluster_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("edge_cluster_id"), col("doc_id")).as("cluster_id"))
    }
    val pairsMat = Dedup.minhashPairs(d, "doc_id", "text", minJaccard = 0.5).localCheckpoint()
    val ids = d.select(col("doc_id"))
    val (obsT, twoJobT) = (
      minOf(5)(Dedup.clusters(ids, pairsMat).count()),
      minOf(5)(clustersTwoJob(ids, pairsMat).count()))
    println(f"AB2 clusters      observe=$obsT%6.3f s  two-job=$twoJobT%6.3f s")

    // ---------------- A/B 3: star (new) vs propagation on same pairs ----
    val (starT, propT) = (
      minOf(5)(Dedup.clustersStar(ids, pairsMat).count()),
      minOf(5)(Dedup.clusters(ids, pairsMat).count()))
    println(f"AB3 star=$starT%6.3f s  propagation=$propT%6.3f s")

    // ------- A/B 4: q_cluster_rep with star vs propagation clusterFn ----
    // (the r20 verdict watch item: re-pin the star default interleaved)
    val (repStarT, repPropT) = (
      minOf(5)(Dedup.clusterRepresentatives(docs, "doc_id", "text").count()),
      minOf(5)(Dedup.clusterRepresentatives(docs, "doc_id", "text",
        clusterFn = Dedup.clusters(_, _)).count()))
    println(f"AB4 cluster_rep   star=$repStarT%6.3f s  propagation=$repPropT%6.3f s")

    // ------- A/B 5: pmi with materialized uni/pairs vs recompute --------
    def pmiRecompute(dd: DataFrame): DataFrame = {
      val uni = dd.select(explode(wordTokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
      val vocab = uni.orderBy(col("cnt").desc, col("token").asc).limit(64)
      val tTot = uni.agg(sum(col("cnt")).as("t_total"))
      val pairs = dd
        .select(bindOnce(wordTokens(col("text")), t =>
          when(size(t) >= 2,
            transform(sequence(lit(1), size(t) - 1), i =>
              struct(element_at(t, i).as("t1"), element_at(t, i + 1).as("t2"))))
            .otherwise(array().cast("array<struct<t1:string,t2:string>>"))).as("ps"))
        .select(explode(col("ps")).as("p"))
        .select(col("p.t1").as("t1"), col("p.t2").as("t2"))
        .groupBy("t1", "t2").agg(count(lit(1)).as("cnt"))
      val pTot = pairs.agg(sum(col("cnt")).as("p_total"))
      pairs
        .filter(col("cnt") >= 2)
        .join(broadcast(vocab.select(col("token").as("t1"), col("cnt").as("c1"))), Seq("t1"))
        .join(broadcast(vocab.select(col("token").as("t2"), col("cnt").as("c2"))), Seq("t2"))
        .crossJoin(broadcast(tTot))
        .crossJoin(broadcast(pTot))
        .select(col("t1"), col("t2"), col("cnt"), col("c1"), col("c2"),
          round(log(
            (col("cnt").cast("double") * col("t_total") * col("t_total")) /
              (col("p_total").cast("double") * col("c1") * col("c2"))) * 1e6)
            .cast("long").as("pmi_micros"))
    }
    val (pmiCkpT, pmiRecT) = (
      minOf(5)(Collocations.pmi(docs, "doc_id", "text").count()),
      minOf(5)(pmiRecompute(d).count()))
    println(f"AB5 pmi           checkpointed=$pmiCkpT%6.3f s  recompute=$pmiRecT%6.3f s")

    spark.stop()
  }
}
