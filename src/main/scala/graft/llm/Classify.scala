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
    // Materialized ONCE: tokCounts feeds the vocab derivation and both
    // inVocab references, and vocab is broadcast three times (inVocab,
    // vSize, the final grid crossJoin) — without the checkpoints each
    // reference re-runs the corpus explode+aggregate subtree (~5 corpus
    // passes for one trained model; optimization guide §2.3/§5). The
    // checkpointed relations are vocabulary-sized, never corpus-sized.
    val tokCounts = docs
      .filter(col(labelCol).isNotNull)
      .select(col(labelCol).cast("string").as("label"),
        explode(wordTokens(col(textCol))).as("token"))
      .groupBy("label", "token").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    // top-V vocabulary, derived from the ALREADY-aggregated counts (a
    // dimension-sized re-agg, not a second corpus pass)
    val vocab = tokCounts.groupBy("token").agg(sum("cnt").as("tot"))
      .orderBy(col("tot").desc, col("token").asc).limit(vocabSize)
      .select("token")
      .localCheckpoint()
    val inVocab = tokCounts.join(broadcast(vocab), "token")
    // label universe comes from the corpus, NOT from inVocab — a label
    // whose every token misses the vocab cap still gets grid rows (t_l=0)
    val labels = docs.filter(col(labelCol).isNotNull)
      .groupBy(col(labelCol).cast("string").as("label"))
      .agg(count(lit(1)).as("n_docs"))
    val labelTotals = labels.join(
      inVocab.groupBy("label").agg(sum("cnt").as("t_l_raw")), Seq("label"), "left")
      .select(col("label"), coalesce(col("t_l_raw"), lit(0L)).as("t_l"))
    val vSize = vocab.agg(count(lit(1)).as("v_size"))
    labelTotals
      .crossJoin(broadcast(vocab)) // L×V dimension-sized grid
      .join(inVocab, Seq("label", "token"), "left")
      .crossJoin(broadcast(vSize)) // 1-row totals frame
      .select(
        col("label"), col("token"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        round(log((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
          (col("t_l") + col("v_size")).cast("double")) * 1e6)
          .cast("long").as("loglik_micros"))
  }

  /** Label priors: `(label, n_docs, prior_micros)` with
    * `prior_micros = round(ln(n_docs / total_docs) * 1e6)`. */
  def nbPriors(docs: DataFrame, labelCol: String): DataFrame = {
    // materialized: referenced twice (rows + the n_total aggregate) —
    // one corpus scan instead of two for an L-row table
    val labels = docs.filter(col(labelCol).isNotNull)
      .groupBy(col(labelCol).cast("string").as("label"))
      .agg(count(lit(1)).as("n_docs"))
      .localCheckpoint()
    labels
      .crossJoin(broadcast(labels.agg(sum("n_docs").as("n_total"))))
      .select(col("label"), col("n_docs"),
        round(log(col("n_docs").cast("double") / col("n_total").cast("double")) * 1e6)
          .cast("long").as("prior_micros"))
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
