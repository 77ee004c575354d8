package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a training-data pipeline
  * actually runs — quality gate, then near-duplicate clustering over the
  * survivors, then a per-document keep/drop decision with a reason.
  *
  * Exact duplicates are subsumed by the near-dup path: identical texts
  * have identical MinHash signatures, collide in every band, and verify at
  * Jaccard 1.0, so they always cluster; the cluster representative is the
  * minimum doc id (deterministic, matching [[Dedup.clusters]] and the
  * recursive-CTE oracle).
  *
  * Output: (doc_id, quality_score, cluster_id, keep, reason) where reason
  * ∈ {low_quality, kept, near_duplicate}; `cluster_id` is null for
  * quality-rejected docs (they never enter pair detection).
  */
object Curation {

  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double = 0.4,
      minJaccard: Double = 0.5): DataFrame = {
    // Materialize only (doc_id, quality_score) — two narrow columns —
    // instead of re-running the tokenizing quality scorer for each of its
    // three consumers (gate, cluster universe, final verdict join). The
    // full text is never checkpointed; it is re-scanned exactly once, by
    // the pair-detection input join below.
    val scores = TextAnalysis.qualityScore(docs, idCol, textCol)
      .select("doc_id", "quality_score").localCheckpoint()
    val passingIds = scores.filter(col("quality_score") >= minQuality)
    val passing = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .join(passingIds.select("doc_id"), Seq("doc_id"))
    val pairs = Dedup.minhashPairs(passing, "doc_id", "text", minJaccard = minJaccard)
    val clustered = Dedup.clusters(passingIds.select("doc_id"), pairs)
    scores
      .join(clustered, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("quality_score"),
        col("cluster_id"),
        when(col("quality_score") < minQuality, lit(false))
          .when(col("doc_id") === col("cluster_id"), lit(true))
          .otherwise(lit(false)).as("keep"),
        when(col("quality_score") < minQuality, lit("low_quality"))
          .when(col("doc_id") === col("cluster_id"), lit("kept"))
          .otherwise(lit("near_duplicate")).as("reason"))
  }

  /** The COMPLETE modern curation recipe (Dolma/FineWeb-shaped), all five
    * gates over one corpus: exact dedup (min-id per md5 group), fixed-rule
    * quality ([[TextAnalysis.qualityScore]]), trained classifier
    * ([[Classify.nbClassify]], self-trained on `labelCol`), bigram-LM
    * probability floor ([[LangModel.lmScore]]), and MinHash near-dup
    * clustering (min-id representative per cluster). Gates evaluate
    * INDEPENDENTLY over the full corpus (models self-train on everything;
    * no gate's outcome changes another's training set — the shape that
    * keeps every signal reusable and the whole verdict exactly
    * oracle-checkable); the verdict reports the FIRST failing gate in
    * the order above. Output: (doc_id, keep, reason ∈ {exact_dup,
    * low_quality, off_label, low_lp, near_duplicate, kept}).
    *
    * Scale shape: gates 2–4 are zero-shuffle kernel projections; gate 1
    * is one 32-byte-key window; gate 5 is the bucketed LSH + label
    * propagation stack; the verdict joins five doc-keyed relations —
    * every shuffle is id- or digest-keyed, nothing is all-pairs. */
  def curateV2(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      acceptLabels: Set[String],
      minQuality: Double = 0.4,
      minAvgLpMicros: Long = -3450000L,
      minJaccard: Double = 0.5): DataFrame = {
    require(acceptLabels.nonEmpty, "curateV2 needs at least one accept label")
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      col(labelCol).cast("string").as("__label"))
    val exact = d.select(col("doc_id"),
      min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text"))))
        .as("keep_id"))
    val quality = TextAnalysis.qualityScore(d, "doc_id", "text")
      .select("doc_id", "quality_score")
    val nb = Classify.nbClassify(d, "doc_id", "text", "__label")
      .select("doc_id", "predicted_label")
    val lm = LangModel.lmScore(d, "doc_id", "text")
    val reps = Dedup.clusters(d.select(col("doc_id")),
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
}
