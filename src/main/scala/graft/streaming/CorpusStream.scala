package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming corpus ingestion: continuous exact dedup over a document
  * file stream — the incremental form of [[graft.llm.Dedup.exact]] for a
  * corpus that arrives folder-by-folder (crawl drops, snapshot deltas).
  *
  * State = one row per distinct `md5(text)` in the state store, sharded by
  * the dedup key's shuffle partitioning. Unbounded by default (exact dedup
  * has no expiry semantics); pass `withinWatermark` + an event-time column
  * to bound state when near-in-time duplicates are the only concern
  * (`dropDuplicatesWithinWatermark`, the standard state-bounding knob).
  */
object CorpusStream {

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocuments(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(documentsSchema).parquet(path)

  /** First-seen wins: emits each distinct text's first arriving row. */
  def streamingExactDedup(docs: DataFrame): DataFrame =
    docs
      .withColumn("text_md5", md5(col("text")))
      .dropDuplicates("text_md5")

  /** Bounded-state variant: duplicates are dropped only while the key is
    * inside the watermark horizon of `eventTimeCol`; once the watermark
    * passes a key's event time its state is evicted, so total state is
    * O(docs per watermark window) instead of O(all-time distinct docs) —
    * the right trade when near-in-time duplicates (re-crawls, retried
    * drops) are the concern and historical dedup is left to the batch
    * [[graft.llm.Dedup.incremental]] pass. */
  def streamingDedupWithinWatermark(
      docs: DataFrame,
      eventTimeCol: String,
      delay: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_md5", md5(col("text")))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("text_md5")
}
