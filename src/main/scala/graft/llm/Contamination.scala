package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share too many
  * word n-grams with a held-out benchmark/eval set — the standard guard
  * against test-set leakage into training corpora.
  *
  * Shape at scale: the benchmark gram set is dimension-sized (eval suites
  * are small), so the overlap test is an explode of the training corpus's
  * distinct grams followed by a broadcast-friendly equi-join against the
  * distinct benchmark grams and one groupBy(doc) — a single shuffle of
  * (doc_id, gram_hash) longs, never of document text. Grams are hashed
  * with the SQL-portable [[TextHash.polyHash]] family so the whole
  * operator is oracle-checkable.
  */
object Contamination {

  /** Per-document benchmark overlap: (doc_id, n_grams, n_matched,
    * contamination_ratio, contaminated).
    *
    * @param docs      corpus (benchmark docs included; they report ~1.0)
    * @param benchmark held-out set to protect
    * @param n         word n-gram width
    * @param maxRatio  contamination threshold on matched/total grams
    */
  def overlap(
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      maxRatio: Double = 0.2): DataFrame = {
    val grams = docs.select(
      col(idCol).as("doc_id"),
      explode(graft.functions.HashFunctions.ngramHashes(col(textCol), n)).as("g"))
    val benchGrams = benchmark
      .select(explode(graft.functions.HashFunctions.ngramHashes(col(textCol), n)).as("g"))
      .distinct()
    val matched = grams.join(benchGrams, Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_matched"))
    val totals = grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    // docs too short for a single n-gram never enter `grams`; restore them
    // with zero counts so the report covers the whole corpus
    docs.select(col(idCol).as("doc_id"))
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
}
