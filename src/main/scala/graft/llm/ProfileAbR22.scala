package graft.llm

import graft.functions.HashFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import TextHash.bandDigests

/** Dev tool (r22 optimization round): INTRA-SESSION A/B of candidate
  * optimizations — both variants run alternately in one JVM/session so
  * host-window drift (BASELINE.md's measured 2-2.7x same-plan dispersion)
  * cancels out. Old shapes are inline copies of the r21-close code.
  * Not part of the driver contract. */
object ProfileAbR22 {
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
    val which = if (args.nonEmpty) args.toSet else Set("curate_v2", "curate", "decontam")

    def minOf(n: Int)(body: => Unit): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min

    // TRUE alternation: one (a, b) pair per iteration so a host window
    // hits both variants equally; min per variant across iterations.
    def abMin(n: Int)(a: => Unit)(b: => Unit): (Double, Double) = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); a; val t1 = System.nanoTime()
        b; val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      (ts.map(_._1).min, ts.map(_._2).min)
    }

    // ---- old (r21-close) curateV2: gate frames joined back on doc_id ----
    def curateV2Old(
        docsIn: DataFrame,
        idCol: String, textCol: String, labelCol: String,
        acceptLabels: Set[String]): DataFrame = {
      val (minQuality, minAvgLpMicros, minJaccard) = (0.4, -3450000L, 0.5)
      val d = docsIn.select(col(idCol).as("doc_id"), col(textCol).as("text"),
        col(labelCol).cast("string").as("__label"))
        .localCheckpoint()
      val exact = d
        .select(col("doc_id"), md5(col("text")).as("__md5"))
        .select(col("doc_id"),
          min(col("doc_id")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("__md5")))
            .as("keep_id"))
      val quality = TextAnalysis.qualityScore(d, "doc_id", "text")
        .select("doc_id", "quality_score")
      val nb = Classify.nbClassify(d, "doc_id", "text", "__label")
        .select("doc_id", "predicted_label")
      val lm = LangModel.lmScore(d, "doc_id", "text")
      val reps = Dedup.clustersStar(d.select(col("doc_id")),
        Dedup.minhashPairs(d, "doc_id", "text", minJaccard = minJaccard))
      d.select(col("doc_id"))
        .join(exact, Seq("doc_id"))
        .join(quality, Seq("doc_id"))
        .join(nb, Seq("doc_id"))
        .join(lm, Seq("doc_id"))
        .join(reps, Seq("doc_id"))
        .select(col("doc_id"),
          when(col("doc_id") =!= col("keep_id"), lit("exact_dup"))
            .when(col("quality_score") < minQuality, lit("low_quality"))
            .when(!col("predicted_label").isin(acceptLabels.toSeq: _*), lit("off_label"))
            .when(col("lp_micros") < lit(minAvgLpMicros) * col("n_pairs"), lit("low_lp"))
            .when(col("doc_id") =!= col("cluster_id"), lit("near_duplicate"))
            .otherwise(lit("kept")).as("reason"))
        .select(col("doc_id"), (col("reason") === "kept").as("keep"), col("reason"))
    }

    // ---- old (r21-close) curate: text side filtered via id join ----
    def curateOld(docsIn: DataFrame, idCol: String, textCol: String): DataFrame = {
      val (minQuality, minJaccard) = (0.4, 0.5)
      val scores = TextAnalysis.qualityScore(docsIn, idCol, textCol)
        .select("doc_id", "quality_score").localCheckpoint()
      val passingIds = scores.filter(col("quality_score") >= minQuality)
      val passing = docsIn
        .select(col(idCol).as("doc_id"), col(textCol).as("text"))
        .join(passingIds.select("doc_id"), Seq("doc_id"))
      val pairs = Dedup.minhashPairs(passing, "doc_id", "text", minJaccard = minJaccard)
      val clustered = Dedup.clustersStar(passingIds.select("doc_id"), pairs)
      scores
        .join(clustered, Seq("doc_id"), "left")
        .select(
          col("doc_id"), col("quality_score"), col("cluster_id"),
          when(col("quality_score") < minQuality, lit(false))
            .when(col("doc_id") === col("cluster_id"), lit(true))
            .otherwise(lit(false)).as("keep"),
          when(col("quality_score") < minQuality, lit("low_quality"))
            .when(col("doc_id") === col("cluster_id"), lit("kept"))
            .otherwise(lit("near_duplicate")).as("reason"))
    }

    // ---- old (r21-close) Contamination.overlap: two corpus explodes ----
    def overlapOld(docsIn: DataFrame, benchmark: DataFrame,
        idCol: String, textCol: String): DataFrame = {
      val (n, maxRatio) = (3, 0.2)
      val grams = docsIn.select(
        col(idCol).as("doc_id"),
        explode(graft.functions.HashFunctions.ngramHashes(col(textCol), n)).as("g"))
      val benchGrams = benchmark
        .select(explode(graft.functions.HashFunctions.ngramHashes(col(textCol), n)).as("g"))
        .distinct()
      val matched = grams.join(benchGrams, Seq("g"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_matched"))
      val totals = grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      docsIn.select(col(idCol).as("doc_id"))
        .join(totals, Seq("doc_id"), "left")
        .join(matched, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_matched"), lit(0L)).as("n_matched"),
          when(coalesce(col("n_grams"), lit(0L)) === 0, lit(0.0))
            .otherwise(coalesce(col("n_matched"), lit(0L)).cast("double") / col("n_grams"))
            .as("contamination_ratio"),
          (when(coalesce(col("n_grams"), lit(0L)) === 0, lit(0.0))
            .otherwise(coalesce(col("n_matched"), lit(0L)).cast("double") / col("n_grams"))
            >= maxRatio).as("contaminated"))
    }

    // ---- r22 verdict ask #2: curateV2's corpus-sized localCheckpoint —
    // default MEMORY_AND_DISK vs serialized vs NO materialization (each
    // gate re-scans column-pruned parquet). Same NEW inline-gate shape in
    // all three; only the `d` materialization differs.
    def curateV2Mat(
        docsIn: DataFrame,
        mat: DataFrame => DataFrame): DataFrame = {
      val (minQuality, minAvgLpMicros, minJaccard) = (0.4, -3450000L, 0.5)
      val acceptLabels = Set("en", "de", "fr")
      val d = mat(docsIn.select(col("doc_id"), col("text"),
        col("lang").cast("string").as("__label")))
      val exact = d
        .select(col("doc_id"), md5(col("text")).as("__md5"))
        .select(col("doc_id"),
          min(col("doc_id")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("__md5")))
            .as("keep_id"))
      val scored = LangModel.lmScore(
        TextAnalysis.qualityScore(
          Classify.nbClassify(d, "doc_id", "text", "__label",
            passThrough = Seq("text")),
          "doc_id", "text", passThrough = Seq("text", "predicted_label")),
        "doc_id", "text", passThrough = Seq("quality_score", "predicted_label"))
      val reps = Dedup.clustersStar(d.select(col("doc_id")),
        Dedup.minhashPairs(d, "doc_id", "text", minJaccard = minJaccard))
      scored
        .join(exact, Seq("doc_id"))
        .join(reps, Seq("doc_id"))
        .select(col("doc_id"),
          when(col("doc_id") =!= col("keep_id"), lit("exact_dup"))
            .when(col("quality_score") < minQuality, lit("low_quality"))
            .when(!col("predicted_label").isin(acceptLabels.toSeq: _*), lit("off_label"))
            .when(col("lp_micros") < lit(minAvgLpMicros) * col("n_pairs"), lit("low_lp"))
            .when(col("doc_id") =!= col("cluster_id"), lit("near_duplicate"))
            .otherwise(lit("kept")).as("reason"))
        .select(col("doc_id"), (col("reason") === "kept").as("keep"), col("reason"))
    }

    // ---- old (r21-close) PCA state: kernel explode + groupBy(i,j) ----
    def pcaStateOld(embeddings: DataFrame, vecCol: String, dim: Int): DataFrame = {
      val vecs = embeddings
        .filter(col(vecCol).isNotNull)
        .select(transform(Similarity.asDouble(col(vecCol)),
          x => round(x * 1e6).cast("long")).as("q"))
      vecs
        .select(explode(graft.functions.HashFunctions.pcaMoments(col("q"), dim)).as("c"))
        .select(col("c.i").as("i"), col("c.j").as("j"),
          col("c.x").cast("decimal(38,0)").as("x"))
        .groupBy("i", "j")
        .agg(sum("x").as("s"))
    }

    if (which("pca")) {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val (oldT, newT) = abMin(5)(
        pcaStateOld(e, "embedding", 64).count())(
        Pca.state(e, "embedding", 64).count())
      println(f"AB_pcaState  old(explode+groupBy)=$oldT%6.3f s  new(128-bit agg)=$newT%6.3f s")
      // sanity: identical (i, j, s) rows
      val diff = pcaStateOld(e, "embedding", 64)
        .withColumnRenamed("s", "s_old")
        .join(Pca.state(e, "embedding", 64), Seq("i", "j"), "full")
        .filter(col("s_old").isNull || col("s").isNull || col("s_old") =!= col("s"))
        .count()
      println(s"AB_pcaState  row-diff=$diff (must be 0)")
    }

    if (which("bm25")) {
      val terms = Seq("table", "stream", "hash", "vector")
      def bm25Old(d: DataFrame): DataFrame = {
        val postings = d
          .select(col("doc_id"),
            TextHash.bindOnce(TextHash.wordTokens(col("text")), t =>
              struct(size(t).as("dl"),
                filter(t, tok => tok.isin(terms: _*)).as("toks"))).as("s"))
          .select(col("doc_id"), col("s.dl").as("dl"), explode(col("s.toks")).as("token"))
          .groupBy("token", "doc_id")
          .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))
        // the r21-close shape scored via the separate corpusStats pass;
        // replicate by feeding bm25OverIndex the two pieces
        Retrieval.bm25OverIndex(postings,
          Retrieval.corpusStats(d, "doc_id", "text"), terms, k = 20, logIdf = false)
      }
      val (oldT, newT) = abMin(5)(
        bm25Old(docs).count())(
        Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 20, logIdf = false).count())
      println(f"AB_bm25      old(2-pass)=$oldT%6.3f s  new(1-pass)=$newT%6.3f s")
    }

    // ---- minhashPairs with SERIALIZED sh/shCand checkpoints (the sh
    // relation carries hs arrays ~ the text's size — same storage
    // argument as curateV2's corpus checkpoint) vs the in-code default.
    def minhashPairsSer(d: DataFrame): DataFrame = {
      val (perms, nBands, rowsPerBand, minJaccard, maxBucket, estSlack) =
        (64, 16, 4, 0.5, Dedup.MaxBucket, 0.15)
      val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
      val sh = d
        .select(col("doc_id"), HashFunctions.shingleHashes(col("text"), 5).as("hs"))
        .withColumn("sig", HashFunctions.minhashSignature(col("hs"), perms))
        .localCheckpoint(true, ser)
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
        .localCheckpoint(true, ser)
      pairsM
        .join(shCand.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
        .join(shCand.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
        .filter(HashFunctions.sigAgreement(col("sig_a"), col("sig_b")) >= minAgree)
        .select(col("doc_a"), col("doc_b"))
        .join(shCand.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), Seq("doc_a"))
        .join(shCand.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          HashFunctions.jaccardLong(col("hs_a"), col("hs_b")).as("jaccard"))
        .filter(col("jaccard") >= minJaccard)
    }

    // ---- minhashPairs WITHOUT the candidate-id-set distinct (a left
    // semi ignores duplicate build rows; the distinct costs one
    // aggregation per call) vs the in-code shape.
    def minhashPairsNoDistinct(d: DataFrame): DataFrame = {
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
          pairsM.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id")),
          Seq("doc_id"), "left_semi")
        .localCheckpoint()
      pairsM
        .join(shCand.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
        .join(shCand.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
        .filter(HashFunctions.sigAgreement(col("sig_a"), col("sig_b")) >= minAgree)
        .select(col("doc_a"), col("doc_b"))
        .join(shCand.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), Seq("doc_a"))
        .join(shCand.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          HashFunctions.jaccardLong(col("hs_a"), col("hs_b")).as("jaccard"))
        .filter(col("jaccard") >= minJaccard)
    }

    // ---- old (r21-close) distributed model-table tails ----
    def nbTrainOld(docsIn: DataFrame, labelCol: String, vocabSize: Int = 64): DataFrame = {
      val tokCounts = docsIn
        .filter(col(labelCol).isNotNull)
        .select(col(labelCol).cast("string").as("label"),
          explode(TextHash.wordTokens(col("text"))).as("token"))
        .groupBy("label", "token").agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val vocabD = tokCounts.groupBy("token").agg(sum("cnt").as("tot"))
        .orderBy(col("tot").desc, col("token").asc).limit(vocabSize)
        .select("token")
        .localCheckpoint()
      val inVocab = tokCounts.join(broadcast(vocabD), "token")
      val labels = docsIn.filter(col(labelCol).isNotNull)
        .groupBy(col(labelCol).cast("string").as("label"))
        .agg(count(lit(1)).as("n_docs"))
      val labelTotals = labels.join(
        inVocab.groupBy("label").agg(sum("cnt").as("t_l_raw")), Seq("label"), "left")
        .select(col("label"), coalesce(col("t_l_raw"), lit(0L)).as("t_l"))
      val vSizeD = vocabD.agg(count(lit(1)).as("v_size"))
      labelTotals
        .crossJoin(broadcast(vocabD))
        .join(inVocab, Seq("label", "token"), "left")
        .crossJoin(broadcast(vSizeD))
        .select(
          col("label"), col("token"),
          coalesce(col("cnt"), lit(0L)).as("cnt"),
          round(log((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
            (col("t_l") + col("v_size")).cast("double")) * 1e6)
            .cast("long").as("loglik_micros"))
    }
    def nbPriorsOld(docsIn: DataFrame, labelCol: String): DataFrame = {
      val labels = docsIn.filter(col(labelCol).isNotNull)
        .groupBy(col(labelCol).cast("string").as("label"))
        .agg(count(lit(1)).as("n_docs"))
        .localCheckpoint()
      labels
        .crossJoin(broadcast(labels.agg(sum("n_docs").as("n_total"))))
        .select(col("label"), col("n_docs"),
          round(log(col("n_docs").cast("double") / col("n_total").cast("double")) * 1e6)
            .cast("long").as("prior_micros"))
    }
    def lmUnigramsOld(docsIn: DataFrame, vocabSize: Int = 64): DataFrame = {
      val toks = docsIn.select(explode(TextHash.wordTokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
      val vocabD = toks
        .orderBy(col("cnt").desc, col("token").asc).limit(vocabSize)
      vocabD
        .crossJoin(broadcast(vocabD.agg(count(lit(1)).as("v_size"))))
        .select(col("token"), col("cnt"),
          round(log(lit(1.0) / (col("cnt") + col("v_size")).cast("double")) * 1e6)
            .cast("long").as("fallback_micros"))
    }
    def lmBigramsWithOld(docsIn: DataFrame, uni: DataFrame): DataFrame = {
      val pairs = docsIn
        .select(TextHash.bindOnce(TextHash.wordTokens(col("text")), t =>
          when(size(t) >= 2,
            transform(sequence(lit(1), size(t) - 1), i =>
              struct(element_at(t, i).as("t1"), element_at(t, i + 1).as("t2"))))
            .otherwise(array().cast("array<struct<t1:string,t2:string>>"))).as("ps"))
        .select(explode(col("ps")).as("p"))
        .select(col("p.t1").as("t1"), col("p.t2").as("t2"))
        .groupBy("t1", "t2").agg(count(lit(1)).as("cnt"))
      pairs
        .join(broadcast(uni.select(col("token").as("t1"), col("cnt").as("c1"))), Seq("t1"))
        .join(broadcast(uni.select(col("token").as("t2"))), Seq("t2"))
        .crossJoin(broadcast(uni.agg(count(lit(1)).as("v_size"))))
        .select(col("t1"), col("t2"), col("cnt"),
          round(log((col("cnt") + lit(1L)).cast("double") /
            (col("c1") + col("v_size")).cast("double")) * 1e6)
            .cast("long").as("loglik_micros"))
    }
    def nbClassifyOld(docsIn: DataFrame): DataFrame =
      Classify.nbScoreWith(docsIn, "doc_id", "text",
        nbTrainOld(docsIn, "lang"), nbPriorsOld(docsIn, "lang"),
        passThrough = Seq("lang"))
    def lmScoreOld(docsIn: DataFrame): DataFrame = {
      val uni = lmUnigramsOld(docsIn).localCheckpoint()
      LangModel.lmScoreWith(docsIn, "doc_id", "text", uni,
        lmBigramsWithOld(docsIn, uni))
    }

    if (which("models")) {
      val (nbOld, nbNew) = abMin(5)(
        nbClassifyOld(docs).count())(
        Classify.nbClassify(docs, "doc_id", "text", "lang",
          passThrough = Seq("lang")).count())
      println(f"AB_nbClassify old(distributed tails)=$nbOld%6.3f s  new(driver tables)=$nbNew%6.3f s")
      val (lmOld, lmNew) = abMin(5)(
        lmScoreOld(docs).count())(
        LangModel.lmScore(docs, "doc_id", "text").count())
      println(f"AB_lmScore    old=$lmOld%6.3f s  new=$lmNew%6.3f s")
      val (ltOld, ltNew) = abMin(5)(
        lmBigramsWithOld(docs, lmUnigramsOld(docs).localCheckpoint()).count())(
        LangModel.lmBigrams(docs, "doc_id", "text").count())
      println(f"AB_lmTrain    old=$ltOld%6.3f s  new=$ltNew%6.3f s")
    }

    def pmiOld(docsIn: DataFrame, vocabSize: Int = 64, minCount: Int = 2): DataFrame = {
      val uni = docsIn.select(explode(TextHash.wordTokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val vocabD = uni.orderBy(col("cnt").desc, col("token").asc).limit(vocabSize)
      val tTot = uni.agg(sum(col("cnt")).as("t_total"))
      val pairs = docsIn
        .select(TextHash.bindOnce(TextHash.wordTokens(col("text")), t =>
          when(size(t) >= 2,
            transform(sequence(lit(1), size(t) - 1), i =>
              struct(element_at(t, i).as("t1"), element_at(t, i + 1).as("t2"))))
            .otherwise(array().cast("array<struct<t1:string,t2:string>>"))).as("ps"))
        .select(explode(col("ps")).as("p"))
        .select(col("p.t1").as("t1"), col("p.t2").as("t2"))
        .groupBy("t1", "t2").agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val pTot = pairs.agg(sum(col("cnt")).as("p_total"))
      pairs
        .filter(col("cnt") >= minCount)
        .join(broadcast(vocabD.select(col("token").as("t1"), col("cnt").as("c1"))), Seq("t1"))
        .join(broadcast(vocabD.select(col("token").as("t2"), col("cnt").as("c2"))), Seq("t2"))
        .crossJoin(broadcast(tTot))
        .crossJoin(broadcast(pTot))
        .select(col("t1"), col("t2"), col("cnt"), col("c1"), col("c2"),
          round(log(
            (col("cnt").cast("double") * col("t_total") * col("t_total")) /
              (col("p_total").cast("double") * col("c1") * col("c2"))) * 1e6)
            .cast("long").as("pmi_micros"))
    }

    // ---- FULL r21-close curateV2: join-gates + corpus ckpt + the old
    // distributed model tails + loop-path clustering — every r22 change
    // reverted at once, so one session settles the composite question.
    def curateV2FullOld(docsIn: DataFrame): DataFrame = {
      val (minQuality, minAvgLpMicros, minJaccard) = (0.4, -3450000L, 0.5)
      val acceptLabels = Set("en", "de", "fr")
      val d = docsIn.select(col("doc_id"), col("text"),
        col("lang").cast("string").as("__label"))
        .localCheckpoint()
      val exact = d
        .select(col("doc_id"), md5(col("text")).as("__md5"))
        .select(col("doc_id"),
          min(col("doc_id")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("__md5")))
            .as("keep_id"))
      val quality = TextAnalysis.qualityScore(d, "doc_id", "text")
        .select("doc_id", "quality_score")
      val nb = Classify.nbScoreWith(d, "doc_id", "text",
        nbTrainOld(d, "__label"), nbPriorsOld(d, "__label"))
        .select("doc_id", "predicted_label")
      val lm = {
        val uni = lmUnigramsOld(d).localCheckpoint()
        LangModel.lmScoreWith(d, "doc_id", "text", uni, lmBigramsWithOld(d, uni))
      }
      val reps = Dedup.clustersStar(d.select(col("doc_id")),
        Dedup.minhashPairs(d, "doc_id", "text", minJaccard = minJaccard),
        smallGraphMaxEdges = 0)
      d.select(col("doc_id"))
        .join(exact, Seq("doc_id"))
        .join(quality, Seq("doc_id"))
        .join(nb, Seq("doc_id"))
        .join(lm, Seq("doc_id"))
        .join(reps, Seq("doc_id"))
        .select(col("doc_id"),
          when(col("doc_id") =!= col("keep_id"), lit("exact_dup"))
            .when(col("quality_score") < minQuality, lit("low_quality"))
            .when(!col("predicted_label").isin(acceptLabels.toSeq: _*), lit("off_label"))
            .when(col("lp_micros") < lit(minAvgLpMicros) * col("n_pairs"), lit("low_lp"))
            .when(col("doc_id") =!= col("cluster_id"), lit("near_duplicate"))
            .otherwise(lit("kept")).as("reason"))
        .select(col("doc_id"), (col("reason") === "kept").as("keep"), col("reason"))
    }

    if (which("v2full")) {
      val (oldT, newT) = abMin(7)(
        curateV2FullOld(docs).count())(
        Curation.curateV2(docs, "doc_id", "text", "lang",
          acceptLabels = Set("en", "de", "fr")).count())
      println(f"AB_v2full    r21-shape=$oldT%6.3f s  r22-shape=$newT%6.3f s")
    }

    if (which("pmi")) {
      val (pOld, pNew) = abMin(5)(
        pmiOld(docs).count())(
        Collocations.pmi(docs, "doc_id", "text").count())
      println(f"AB_pmi       old=$pOld%6.3f s  new(driver tail)=$pNew%6.3f s")
      def phraseOld(): Unit = {
        val phrases = pmiOld(docs).filter(col("pmi_micros") > 0)
          .select("t1", "t2").collect()
          .map(r => (r.getString(0), r.getString(1))).toSeq
        Collocations.mergePhrases(docs, "doc_id", "text", phrases).count()
      }
      def phraseNew(): Unit = {
        val phrases = Collocations.pmi(docs, "doc_id", "text")
          .filter(col("pmi_micros") > 0)
          .select("t1", "t2").collect()
          .map(r => (r.getString(0), r.getString(1))).toSeq
        Collocations.mergePhrases(docs, "doc_id", "text", phrases).count()
      }
      val (phOld, phNew) = abMin(5)(phraseOld())(phraseNew())
      println(f"AB_phrase    old=$phOld%6.3f s  new=$phNew%6.3f s")
    }

    if (which("smallgraph")) {
      val d2 = docs.select(col("doc_id"), col("text"))
      val pairsM = Dedup.minhashPairs(d2, "doc_id", "text", minJaccard = 0.5)
        .localCheckpoint()
      val universe = d2.select(col("doc_id"))
      val (loopT, drvT) = abMin(5)(
        Dedup.clustersStar(universe, pairsM, smallGraphMaxEdges = 0).count())(
        Dedup.clustersStar(universe, pairsM).count())
      println(f"AB_sgStar    loop=$loopT%6.3f s  driver-path=$drvT%6.3f s")
      val (loopP, drvP) = abMin(5)(
        Dedup.clusters(universe, pairsM, smallGraphMaxEdges = 0).count())(
        Dedup.clusters(universe, pairsM).count())
      println(f"AB_sgProp    loop=$loopP%6.3f s  driver-path=$drvP%6.3f s")
      val (repOld, repNew) = abMin(5)(
        Dedup.clusterRepresentatives(d2, "doc_id", "text",
          clusterFn = Dedup.clustersStar(_, _, smallGraphMaxEdges = 0)).count())(
        Dedup.clusterRepresentatives(d2, "doc_id", "text").count())
      println(f"AB_sgRep     loop=$repOld%6.3f s  driver-path=$repNew%6.3f s")
    }

    if (which("minhash_nd")) {
      val d2 = docs.select(col("doc_id"), col("text"))
      val (oldT, newT) = abMin(5)(
        Dedup.minhashPairs(d2, "doc_id", "text", minJaccard = 0.5).count())(
        minhashPairsNoDistinct(d2).count())
      println(f"AB_mhNoDist  with-distinct=$oldT%6.3f s  no-distinct=$newT%6.3f s")
    }

    if (which("minhash_ser")) {
      val d2 = docs.select(col("doc_id"), col("text"))
      val (oldT, newT) = abMin(5)(
        Dedup.minhashPairs(d2, "doc_id", "text", minJaccard = 0.5).count())(
        minhashPairsSer(d2).count())
      println(f"AB_mhSer     default-ckpt=$oldT%6.3f s  ser-ckpt=$newT%6.3f s")
    }

    // ---- ccnetBuckets with the narrow scored relation materialized
    // once (feeds the cutoff agg AND the bucket join probe) vs the
    // in-code double evaluation.
    def ccnetCkpt(docsIn: DataFrame): DataFrame = {
      val uni = LangModel.lmUnigrams(docsIn, "doc_id", "text", 64).localCheckpoint()
      val scored = LangModel.lmScoreWith(docsIn, "doc_id", "text", uni,
          LangModel.lmBigramsWith(docsIn, "text", uni),
          passThrough = Seq("lang"))
        .withColumn("tok_lp_micros",
          when(col("n_pairs") === 0, lit(null).cast("long"))
            .otherwise(round(lit(1000000.0) * col("lp_micros").cast("double")
              / col("n_pairs")).cast("long")))
        .localCheckpoint()
      val cuts = scored.groupBy("lang").agg(
        round(percentile(col("tok_lp_micros"), lit(1.0 / 3))).cast("long").as("__c_lo"),
        round(percentile(col("tok_lp_micros"), lit(2.0 / 3))).cast("long").as("__c_hi"))
      scored.join(broadcast(cuts), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("n_pairs"), col("lp_micros"),
          col("tok_lp_micros"),
          when(col("tok_lp_micros").isNull, "tail")
            .when(col("tok_lp_micros") >= col("__c_hi"), "head")
            .when(col("tok_lp_micros") >= col("__c_lo"), "middle")
            .otherwise("tail").as("bucket"))
    }

    // ---- old (r21-close) curateV3: join-gates + corpus localCheckpoint
    def curateV3Old(docsIn: DataFrame, benchmark: DataFrame): DataFrame = {
      val (minQuality, minAvgLpMicros, minJaccard) = (0.4, -3450000L, 0.5)
      val perDomain = 3
      val acceptLabels = Set("en", "de", "fr")
      val d = docsIn.select(col("doc_id"), col("text"),
        col("lang").cast("string").as("__label"), col("url").as("__url"))
        .localCheckpoint()
      val exact = d
        .select(col("doc_id"), md5(col("text")).as("__md5"))
        .select(col("doc_id"),
          min(col("doc_id")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("__md5")))
            .as("keep_id"))
      val winners = Mixture.domainCap(
        d.select(col("doc_id"), col("__url")), "doc_id", "__url", perDomain)
        .select(col("doc_id"), lit(true).as("in_cap"))
      val quality = TextAnalysis.qualityScore(d, "doc_id", "text")
        .select("doc_id", "quality_score")
      val nb = Classify.nbClassify(d, "doc_id", "text", "__label")
        .select("doc_id", "predicted_label")
      val lm = LangModel.lmScore(d, "doc_id", "text")
      val contam = overlapOld(d, benchmark, "doc_id", "text")
        .select("doc_id", "contaminated")
      val reps = Dedup.clustersStar(d.select(col("doc_id")),
        Dedup.minhashPairs(d, "doc_id", "text", minJaccard = minJaccard))
      d.select(col("doc_id"))
        .join(exact, Seq("doc_id"))
        .join(winners, Seq("doc_id"), "left")
        .join(quality, Seq("doc_id"))
        .join(nb, Seq("doc_id"))
        .join(lm, Seq("doc_id"))
        .join(contam, Seq("doc_id"))
        .join(reps, Seq("doc_id"))
        .select(col("doc_id"),
          when(col("doc_id") =!= col("keep_id"), lit("exact_dup"))
            .when(col("in_cap").isNull, lit("domain_capped"))
            .when(col("quality_score") < minQuality, lit("low_quality"))
            .when(!col("predicted_label").isin(acceptLabels.toSeq: _*), lit("off_label"))
            .when(col("lp_micros") < lit(minAvgLpMicros) * col("n_pairs"), lit("low_lp"))
            .when(col("contaminated"), lit("contaminated"))
            .when(col("doc_id") =!= col("cluster_id"), lit("near_duplicate"))
            .otherwise(lit("kept")).as("reason"))
        .select(col("doc_id"), (col("reason") === "kept").as("keep"), col("reason"))
    }

    if (which("curate_v3")) {
      val d3 = docs.withColumn("url",
        concat(lit("https://"), col("source"), lit(".com/p/"), col("doc_id")))
      val bench = d3.filter(col("doc_id") < 50)
      val (oldT, newT) = abMin(5)(
        curateV3Old(d3, bench).count())(
        Curation.curateV3(d3, "doc_id", "text", "lang", "url", bench,
          acceptLabels = Set("en", "de", "fr"), perDomain = 3).count())
      println(f"AB_curateV3  old(join-gates+ckpt)=$oldT%6.3f s  new(inline+rescan)=$newT%6.3f s")
    }

    if (which("ccnet")) {
      val (oldT, newT) = abMin(5)(
        LangModel.ccnetBuckets(docs, "doc_id", "text", "lang").count())(
        ccnetCkpt(docs).count())
      println(f"AB_ccnet     old(2-eval)=$oldT%6.3f s  new(ckpt scored)=$newT%6.3f s")
    }

    if (which("v2mat")) {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        curateV2Mat(docs, _.localCheckpoint()).count()
        val t1 = System.nanoTime()
        curateV2Mat(docs, _.localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)).count()
        val t2 = System.nanoTime()
        curateV2Mat(docs, identity).count()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      println(f"AB_v2mat  ckpt=${ts.map(_._1).min}%6.3f s  ckptSer=${ts.map(_._2).min}%6.3f s  rescan=${ts.map(_._3).min}%6.3f s")
    }

    if (which("curate_v2")) {
      val labels = Set("en", "de", "fr")
      val (oldT, newT) = abMin(5)(
        curateV2Old(docs, "doc_id", "text", "lang", labels).count())(
        Curation.curateV2(docs, "doc_id", "text", "lang", labels).count())
      println(f"AB_curateV2  old(join-gates)=$oldT%6.3f s  new(inline-gates)=$newT%6.3f s")
    }
    if (which("curate")) {
      val (oldT, newT) = abMin(5)(
        curateOld(docs, "doc_id", "text").count())(
        Curation.curate(docs, "doc_id", "text").count())
      println(f"AB_curate    old(id-join filter)=$oldT%6.3f s  new(inline filter)=$newT%6.3f s")
    }
    if (which("decontam")) {
      val bench = docs.filter(col("doc_id") < 50)
      val (oldT, newT) = abMin(5)(
        overlapOld(docs, bench, "doc_id", "text").count())(
        Contamination.overlap(docs, bench, "doc_id", "text").count())
      println(f"AB_overlap   old(2-pass)=$oldT%6.3f s  new(1-pass)=$newT%6.3f s")
    }

    spark.stop()
  }
}
