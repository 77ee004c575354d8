package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextHash._

/** Trainable multinomial naive-Bayes document classifier — the classic
  * fasttext/CCNet-style curation filter: train per-label token
  * likelihoods on a labeled corpus (language, source domain, quality
  * tier), then score every document with a pure projection. The
  * reference pipeline has no trained classifier; this is part of the
  * beyond-parity LLM-curation surface (cf. `flood/spark/transforms.py`'s
  * fixed-rule filters, which [[TextAnalysis.qualityScore]] mirrors).
  *
  * Scale shape:
  *  - '''train''' — ONE corpus explode shuffled on (label, token) with
  *    map-side combine (the partial-agg collapses each partition to its
  *    distinct (label, token) pairs before anything ships), then
  *    dimension-sized re-aggregations (vocab top-V, label marginals,
  *    priors). Nothing corpus-sized crosses the wire twice.
  *  - '''score''' — ZERO shuffle: the trained model is dimension-sized
  *    (V×L likelihood entries + L priors), so scoring is a per-row fold
  *    over the document's tokens against a literal token→likelihood map,
  *    exactly the broadcast-kernel discipline of [[Clustering.assign]] /
  *    [[Similarity.ivfTopKWith]].
  *
  * Determinism (what lets the driver's DuckDB gate hash-check a trained
  * model): all likelihoods are quantized to integer micro-logs
  * (`round(ln((cnt+1)/(T_l+V)) * 1e6)`) at train time, so every document
  * score is an INTEGER sum — order-insensitive where double summation is
  * not — and the argmax tiebreak is (score desc, label asc). The only
  * float op is one `ln` per model entry, rounded at 1e-6 (the same
  * micros-quantization every distance query here uses).
  *
  * Residual cross-engine hazard, acknowledged: `ln` is NOT correctly
  * rounded in either engine (JVM `Math.log` vs DuckDB's libm), so a
  * model entry whose `ln(x)·1e6` lands within an ulp of a `.5` micros
  * boundary could quantize off-by-one between engines and flip the
  * exact-hash gate. `LnBoundaryMarginSpec` MEASURES the margin of every
  * trained entry on the gate corpora (sf0.001/sf0.01): the closest
  * entry sits orders of magnitude beyond any plausible libm
  * disagreement (~1e-9), so the hash gate is safe for these corpora by
  * measurement, not hope — and a future corpus change that lands near a
  * boundary fails that spec loudly instead of flaking the driver gate.
  * Since round 17 the model-table oracles additionally carry an
  * acknowledged ±1-micro tolerance (`LlmQueries.lnToleranceEcho`: verify
  * every entry within one micro, echo the Spark rows on success, echo
  * the independent model on any real defect), with `LnBoundarySpec`
  * pinning that two conforming log implementations can never quantize
  * more than one micro apart — so even an adversarial future corpus
  * cannot flake the gate, only fail it honestly.
  *
  * Input contract: labels must be non-null strings ([[nbTrain]] filters
  * null labels; document ids follow the corpus-wide uniqueness contract).
  * ASCII labels sort identically as Scala Strings and UTF8String bytes;
  * non-ASCII labels would need the UTF-8 byte-order sort of
  * [[Clustering]]'s id tiebreak.
  */
object Classify {

  /** Per-label token-count model with add-one smoothing, restricted to
    * the top-`vocabSize` tokens by corpus frequency (count desc, token
    * asc — deterministic at the cap boundary).
    *
    * Output: `(label, token, cnt, loglik_micros)` — a DENSE grid (every
    * label × every vocab token, zero-filled), so scoring never misses a
    * lookup: `loglik_micros = round(ln((cnt+1)/(T_l+V)) * 1e6)` where
    * `T_l` is the label's in-vocab token total and `V` the realized
    * vocabulary size.
    */
  def nbTrain(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      vocabSize: Int = 64): DataFrame = {
    // Materialized ONCE: tokCounts (vocabulary×label-sized, never
    // corpus-sized) feeds the vocab derivation and the in-vocab collect
    // — without the checkpoint each reference re-runs the corpus
    // explode+aggregate subtree (optimization guide §2.3/§5).
    val tokCounts = docs
      .filter(col(labelCol).isNotNull)
      .select(col(labelCol).cast("string").as("label"),
        explode(wordTokens(col(textCol))).as("token"))
      .groupBy("label", "token").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    // The grid itself is DIMENSION-sized (L×V rows), so it is assembled
    // on the driver from three bounded collects (r22 — the driver-held-
    // centroids discipline): top-V vocabulary and the in-vocab counts
    // from the tokCounts checkpoint, the label universe from its own
    // corpus aggregation (a label whose every token misses the vocab cap
    // still gets grid rows, t_l = 0 — and so does a label with no tokens
    // at all, which tokCounts cannot see). The r21 distributed-grid
    // spelling paid ~8 jobs per model build (vocab checkpoint, broadcast
    // builds, multi-stage collects) to produce these same L×V rows.
    // Arithmetic is bit-identical: StrictMath.log is exactly Spark's
    // log expression, roundAsSpark its round→cast(long) chain
    // (NbTrainDriverMathSpec pins both against the SQL spelling).
    val vocab: Seq[String] = tokCounts.groupBy("token").agg(sum("cnt").as("tot"))
      .orderBy(col("tot").desc, col("token").asc).limit(vocabSize)
      .select("token").collect().map(_.getString(0)).toSeq
    val labels: Seq[String] = docs.filter(col(labelCol).isNotNull)
      .select(col(labelCol).cast("string").as("label"))
      .groupBy("label").agg(count(lit(1)))
      .select("label").collect().map(_.getString(0)).toSeq
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("label",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("token",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("loglik_micros",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val spark = docs.sparkSession
    if (vocab.isEmpty || labels.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val inVocab = tokCounts.filter(col("token").isin(vocab: _*))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val vSize = vocab.length.toLong
    val tl: Map[String, Long] = labels.map(l =>
      l -> vocab.iterator.map(t => inVocab.getOrElse((l, t), 0L)).sum).toMap
    val rows = for (l <- labels; t <- vocab) yield {
      val cnt = inVocab.getOrElse((l, t), 0L)
      org.apache.spark.sql.Row(l, t, cnt,
        graft.functions.GraftVecOps.roundAsSpark(
          StrictMath.log((cnt + 1L).toDouble / (tl(l) + vSize).toDouble) * 1e6))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Label priors: `(label, n_docs, prior_micros)` with
    * `prior_micros = round(ln(n_docs / total_docs) * 1e6)`. */
  def nbPriors(docs: DataFrame, labelCol: String): DataFrame = {
    // ONE corpus aggregation, collected (L rows — dimension-sized), then
    // driver arithmetic builds the table (r22; was a checkpoint + a
    // crossJoin-broadcast plan per reference). StrictMath.log /
    // roundAsSpark are bit-identical to the previous log/round SQL
    // (NbTrainDriverMathSpec).
    val labels = docs.filter(col(labelCol).isNotNull)
      .groupBy(col(labelCol).cast("string").as("label"))
      .agg(count(lit(1)).as("n_docs"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val nTotal = labels.map(_._2).sum
    val spark = docs.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("label",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("n_docs",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("prior_micros",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val rows = labels.toSeq.map { case (l, n) =>
      org.apache.spark.sql.Row(l, n,
        graft.functions.GraftVecOps.roundAsSpark(
          StrictMath.log(n.toDouble / nTotal.toDouble) * 1e6))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Score every document against a trained model: ZERO-shuffle pure
    * projection. `score_micros(doc, l) = prior_micros(l) +
    * Σ_{t ∈ tokens(doc) ∩ vocab} loglik_micros(l, t)` (multiplicity
    * counted, out-of-vocab tokens skipped), predicted = argmax with
    * (score desc, label asc) ties.
    *
    * EAGER: the dimension-sized model frames are collected at
    * DataFrame-construction time (same documented posture as
    * [[Similarity.ivfTopKWith]]) and baked in as literal model arrays
    * consumed by the compiled [[graft.functions.GraftModelOps.nbScores]]
    * kernel — hashed O(1) lookups per token at any vocabulary size (a
    * Catalyst literal-map lookup is a linear scan).
    *
    * `passThrough` carries source columns (e.g. the ground-truth label)
    * so a confusion matrix downstream stays a pure re-aggregation —
    * same rationale as [[TextAnalysis.langId]].
    */
  def nbScoreWith(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tokenModel: DataFrame,
      priors: DataFrame,
      passThrough: Seq[String] = Nil): DataFrame = {
    val reserved = Seq("doc_id", "predicted_label", "score_micros")
    val clashes = passThrough.intersect(reserved) ++
      passThrough.diff(passThrough.distinct)
    require(clashes.isEmpty,
      s"nbScoreWith passThrough collides with generated/duplicate columns: ${clashes.mkString(", ")}")
    val pr = priors.select("label", "prior_micros").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    require(pr.nonEmpty, "nbScoreWith: empty prior table (no labels)")
    val labels = pr.map(_._1)
    val labelIx = labels.zipWithIndex.toMap
    val nL = labels.length
    val lik = scala.collection.mutable.LinkedHashMap.empty[String, Array[Long]]
    tokenModel.select("label", "token", "loglik_micros").collect().foreach { r =>
      val arr = lik.getOrElseUpdate(r.getString(1), new Array[Long](nL))
      // a model label absent from the prior table is a caller error
      val ix = labelIx.getOrElse(r.getString(0),
        sys.error(s"nbScoreWith: model label '${r.getString(0)}' missing from priors"))
      arr(ix) = r.getLong(2)
    }
    // compiled kernel: literal-map lookups in Catalyst are LINEAR scans
    // (O(V) per token); the kernel hashes the model once per thread —
    // see GraftModelOps. Same integer sums, same outputs.
    val toks = lik.keys.toSeq
    val likFlat = toks.flatMap(t => lik(t).toSeq)
    docs.select(
      (col(idCol).as("doc_id") +: passThrough.map(col)) :+
        bindOnce(
          graft.functions.GraftModelOps.nbScoresKernel(
            col(textCol), toks, likFlat, pr.map(_._2)),
          scores => {
              // argmax with declaration-order (= label asc) ties: a chain
              // of strict > comparisons, same shape as langId
              val best = (1 until nL).foldLeft(
                (lit(labels.head): Column, element_at(scores, 1))) {
                case ((bestLabel, bestScore), i) =>
                  val s = element_at(scores, i + 1)
                  (when(s > bestScore, lit(labels(i))).otherwise(bestLabel),
                    when(s > bestScore, s).otherwise(bestScore))
              }
              struct(best._1.as("predicted_label"), best._2.as("score_micros"))
            }).as("p"): _*)
      .select((("doc_id" +: passThrough) :+ "p.*").map(col): _*)
  }

  /** Self-train-and-score in one frame (the registry/eval shape): train
    * on the corpus's own labels, then score every document — the
    * held-in fit whose confusion against the true label measures model
    * separability. Production callers persist [[nbTrain]]/[[nbPriors]]
    * once and fan [[nbScoreWith]] over each new corpus drop. */
  def nbClassify(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      vocabSize: Int = 64,
      passThrough: Seq[String] = Nil): DataFrame =
    nbScoreWith(docs, idCol, textCol,
      nbTrain(docs, idCol, textCol, labelCol, vocabSize),
      nbPriors(docs, labelCol), passThrough)
}
