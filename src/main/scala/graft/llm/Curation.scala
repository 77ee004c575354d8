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
}
