package graft.streaming

import graft.llm.Dedup
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
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

  /** Streaming NEAR-duplicate gate — the MinHash counterpart of
    * [[streamingExactDedup]], for a corpus arriving drop-by-drop. Each
    * micro-batch is (1) clustered against itself with the batch MinHash
    * operator and collapsed to one representative (minimum id) per
    * near-dup cluster, then (2) checked against the persisted signature
    * store of everything previously kept via the BIPARTITE incremental
    * join ([[graft.llm.Dedup.minhashIncrementalPairsFromSignatures]] —
    * history is never re-hashed or pair-expanded against itself).
    * Survivors append to `corpusPath`; their `(doc_id, hs, sig)` rows
    * append to `storePath` so the next batch sees them as history. A doc
    * whose in-batch representative is rejected by history is dropped too
    * (transitive near-dup semantics, as in batch curation).
    *
    * Exactly-once without swap machinery: both sinks write hive-style
    * `batch=<id>/` directories with per-directory overwrite, and the
    * history read EXCLUDES the current batch id — a crash-replayed batch
    * overwrites its own partial output and recomputes against the same
    * history, landing on identical results (spec-pinned).
    *
    * Scale posture: per trigger the store is one O(history signatures)
    * scan re-banded into the join — signatures are ~0.5 KB/doc, 100–1000×
    * smaller than the corpus. When even that dominates, persist band
    * postings bucketed by (band, band_hash) in the
    * [[SnapshotStream.bucketedMergeSink]] layout so a batch joins only
    * its touched buckets; this single-store form is the right trade up to
    * ~1 B kept docs per store.
    *
    * Contract: `doc_id` must be globally unique across the stream's
    * lifetime (it keys the store). */
  def nearDupGateSink(
      docs: DataFrame,
      corpusPath: String,
      storePath: String,
      checkpointDir: String,
      shingleK: Int = 5,
      perms: Int = 64,
      nBands: Int = 16,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.5): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        nearDupGateBatch(batch, batchId, corpusPath, storePath,
          shingleK, perms, nBands, rowsPerBand, minJaccard)
      }

  /** One micro-batch of [[nearDupGateSink]], callable directly (the spec
    * drives it batch-by-batch; the sink wires it to foreachBatch). */
  def nearDupGateBatch(
      batch: DataFrame,
      batchId: Long,
      corpusPath: String,
      storePath: String,
      shingleK: Int,
      perms: Int,
      nBands: Int,
      rowsPerBand: Int,
      minJaccard: Double): Unit = {
    val spark = batch.sparkSession
    val b = batch.localCheckpoint() // feeds pairing, clustering, and both sinks
    // (1) in-batch: near-dup clusters -> keep the minimum id per cluster
    val inBatchPairs = Dedup.minhashPairs(b, "doc_id", "text",
      shingleK, perms, nBands, rowsPerBand, minJaccard)
    val reps = Dedup.clusters(b.select(col("doc_id")), inBatchPairs)
      .filter(col("cluster_id") === col("doc_id"))
      .select(col("doc_id"))
    val repDocs = b.join(reps, Seq("doc_id"), "left_semi")
    val shBatch = Dedup.signatureTable(repDocs, "doc_id", "text", shingleK, perms)
      .localCheckpoint()
    // (2) vs history: signature store of previously KEPT docs, excluding
    // any partial output of a crash-replayed run of THIS batch id
    val fs = new Path(storePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val histDupIds =
      if (fs.exists(new Path(storePath))) {
        val hist = spark.read.parquet(storePath)
          .filter(col("batch") =!= batchId)
          .select(col("doc_id").as("hist_id"), col("hs"), col("sig"))
        Dedup.minhashIncrementalPairsFromSignatures(
          shBatch.withColumnRenamed("doc_id", "new_id"), hist,
          nBands, rowsPerBand, minJaccard)
          .select(col("new_id").as("doc_id")).distinct()
      } else shBatch.select(col("doc_id")).limit(0)
    val keptIds = shBatch.select(col("doc_id"))
      .join(histDupIds, Seq("doc_id"), "left_anti")
      .localCheckpoint() // feeds both sink writes below
    // idempotent per-batch landing: overwrite exactly this batch's dir
    b.join(keptIds, Seq("doc_id"), "left_semi")
      .write.mode("overwrite").parquet(s"$corpusPath/batch=$batchId")
    shBatch.join(keptIds, Seq("doc_id"), "left_semi")
      .write.mode("overwrite").parquet(s"$storePath/batch=$batchId")
  }

  /** Kept documents of a corpus maintained by [[nearDupGateSink]] (the
    * hive `batch` partition column is internal bookkeeping — dropped). */
  def readKept(spark: SparkSession, corpusPath: String): DataFrame =
    spark.read.parquet(corpusPath).drop("batch")

  /** Streaming MODEL gate — "train once, score every drop": each arriving
    * micro-batch is scored against PRE-TRAINED model tables
    * ([[graft.llm.Classify.nbTrain]]/[[graft.llm.Classify.nbPriors]] and
    * [[graft.llm.LangModel.lmUnigrams]]/[[graft.llm.LangModel.lmBigrams]],
    * persisted once by a batch training job) and routed: a document is
    * KEPT when its predicted label is in `acceptLabels` AND its bigram
    * log-prob clears the per-pair floor (`lp_micros >= minAvgLpMicros *
    * n_pairs` — the integer form of "average log-prob ≥ threshold";
    * zero-pair docs pass the LM test vacuously). NULL-text documents are
    * always routed to REJECTED (explicit policy: no text means nothing
    * to train on; the scorers themselves treat NULL as the empty token
    * sequence so the routing predicate can never be NULL). Both routes
    * land as idempotent `batch=<id>/` overwrites, the
    * [[nearDupGateBatch]] exactly-once discipline.
    *
    * Scale posture: scoring is the batch operators' ZERO-shuffle
    * projection, so a trigger costs one corpus-scan projection plus two
    * partitioned writes — no state store, no joins, nothing grows with
    * stream lifetime. The dimension-sized model tables are re-collected
    * per trigger (the eager [[graft.llm.Classify.nbScoreWith]] posture);
    * cache them (`.cache()`) in long-running streams to make that a
    * driver-memory read. */
  def scoreGateSink(
      docs: DataFrame,
      keptPath: String,
      rejectedPath: String,
      checkpointDir: String,
      nbTokenModel: DataFrame,
      nbPriors: DataFrame,
      lmUnigramModel: DataFrame,
      lmBigramModel: DataFrame,
      acceptLabels: Set[String],
      minAvgLpMicros: Long): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        scoreGateBatch(batch, batchId, keptPath, rejectedPath,
          nbTokenModel, nbPriors, lmUnigramModel, lmBigramModel,
          acceptLabels, minAvgLpMicros)
      }

  /** One micro-batch of [[scoreGateSink]], callable directly. */
  def scoreGateBatch(
      batch: DataFrame,
      batchId: Long,
      keptPath: String,
      rejectedPath: String,
      nbTokenModel: DataFrame,
      nbPriors: DataFrame,
      lmUnigramModel: DataFrame,
      lmBigramModel: DataFrame,
      acceptLabels: Set[String],
      minAvgLpMicros: Long): Unit = {
    require(acceptLabels.nonEmpty, "scoreGateBatch needs at least one accept label")
    val b = batch.localCheckpoint() // feeds one scoring pass + two writes
    val dataCols = b.columns.filterNot(_ == "doc_id").toSeq
    // both scorers CHAIN as projections (the data columns ride through as
    // passThrough), so routing never joins or shuffles the batch
    val scored = graft.llm.LangModel.lmScoreWith(
      graft.llm.Classify.nbScoreWith(b, "doc_id", "text",
        nbTokenModel, nbPriors, passThrough = dataCols),
      "doc_id", "text", lmUnigramModel, lmBigramModel,
      passThrough = dataCols :+ "predicted_label")
    // NULL-text semantics, decided explicitly: the scorers map NULL text
    // to the empty token sequence (prior-argmax label, n_pairs=0), so a
    // NULL-text doc would pass both gates vacuously. A doc with no text
    // is not trainable content — route it to REJECTED. coalesce keeps
    // the routing total even if a future scorer reintroduces NULL: a
    // NULL pass would drop the doc from kept AND rejected.
    val routed = scored
      .withColumn("pass",
        coalesce(
          col("text").isNotNull &&
            col("predicted_label").isin(acceptLabels.toSeq: _*) &&
            col("lp_micros") >= lit(minAvgLpMicros) * col("n_pairs"),
          lit(false)))
      .localCheckpoint()
    val outCols = ("doc_id" +: dataCols).map(col)
    routed.filter(col("pass")).select(outCols: _*)
      .write.mode("overwrite").parquet(s"$keptPath/batch=$batchId")
    routed.filter(!col("pass")).select(outCols: _*)
      .write.mode("overwrite").parquet(s"$rejectedPath/batch=$batchId")
  }
}
