package graft.streaming

import graft.model.Schemas
import graft.transforms.Normalize
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming ingest of the flood forecast: the incremental path for the
  * reference's daily batch (SURVEY §2.9). New filtered-forecast parquet
  * files appear under a folder (one drop per leadtime, exactly how the
  * reference's GRIB→Parquet stage writes); this stream normalizes each
  * micro-batch and joins it against the static per-cell thresholds to emit
  * per-row exceedance flags — a **stream–static join**, which Spark plans
  * as a broadcast of the static side into every micro-batch with no
  * streaming state at all.
  *
  * Scale posture: stateless (no watermark needed), so throughput is the
  * file-source scan rate; the threshold table is dimension-sized →
  * broadcast; `Trigger.AvailableNow` gives catch-up-then-stop daily runs,
  * a continuous trigger gives sub-minute alerting. The ensemble
  * *aggregation* (exceedance probabilities) stays in the batch path — it
  * needs all 51 members per (cell, step), which is a completeness
  * condition, not a time condition; running it per-day after the stream
  * lands files preserves the reference's semantics exactly.
  */
object ForecastStream {

  /** File-source stream of raw forecast rows (explicit schema — required
    * for streaming reads, and skips inference). */
  def readForecast(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(Schemas.rawForecast).parquet(path)

  /** Streaming read of RAW GRIB2 files: the [[graft.sources.GribSource]]
    * micro-batch surface — each newly landed file under the glob becomes
    * decoded cells in the next batch, removing the reference's separate
    * GRIB→parquet conversion job from the streaming path too. Pair with
    * [[graft.transforms.Normalize.fromGrib]] or [[gribExceedances]]. */
  def readGrib(
      spark: SparkSession,
      pathGlob: String,
      numPartitions: Int = 8,
      maxFilesPerTrigger: Int = 0,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream
      .format(classOf[graft.sources.GribSource].getName)
      .options(options) // e.g. maxFileAge, ignoreMissingFiles
      .option("path", pathGlob)
      .option("numPartitions", numPartitions.toString)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load()

  /** Normalized stream with per-row threshold-exceedance flags:
    * stream–static equi-join on the rounded cell keys (broadcast static
    * side), then the P8 indicator per return period. */
  def exceedances(
      forecastStream: DataFrame,
      thresholds: DataFrame,
      precision: Int = 3,
      thresholdYears: Seq[Int] = Seq(2, 5, 20)): DataFrame =
    flagged(Normalize.forecast(forecastStream, precision),
      thresholds, precision, thresholdYears)

  /** [[exceedances]] straight from a RAW GRIB stream ([[readGrib]]) — the
    * full alerting path with no intermediate parquet landing at all:
    * GRIB drop directory → decode → normalize → stream–static threshold
    * join → flags. */
  def gribExceedances(
      gribStream: DataFrame,
      thresholds: DataFrame,
      precision: Int = 3,
      thresholdYears: Seq[Int] = Seq(2, 5, 20)): DataFrame =
    flagged(Normalize.fromGrib(gribStream, precision),
      thresholds, precision, thresholdYears)

  private def flagged(
      normalized: DataFrame,
      thresholds: DataFrame,
      precision: Int,
      thresholdYears: Seq[Int]): DataFrame = {
    val joined = normalized
      .join(broadcast(Normalize.roundKeys(thresholds, precision)),
        Seq("latitude", "longitude"), "left")
    thresholdYears.foldLeft(joined) { (df, n) =>
      df.withColumn(s"exceed_${n}y",
        when(col("dis24") >= col(s"threshold_${n}y"), 1).otherwise(0))
    }
  }

  /** Alert stream: only rows whose discharge exceeds the `alertYears`
    * return-period threshold — append-mode, stateless, ready for a sink. */
  def alerts(
      forecastStream: DataFrame,
      thresholds: DataFrame,
      precision: Int = 3,
      alertYears: Int = 20): DataFrame =
    exceedances(forecastStream, thresholds, precision)
      .filter(col(s"exceed_${alertYears}y") === 1)

  /** Streaming sink into the date-partitioned serving layout via
    * `foreachBatch` — the production pattern for landing a stream in a
    * batch-queryable table. Each micro-batch appends into its
    * `issued_on=.../` partitions; the stream checkpoint makes the
    * file-source exactly-once (a rerun over the same checkpoint reprocesses
    * nothing, pinned by spec). `.start()` to run; pair with
    * `Trigger.AvailableNow` for daily catch-up jobs. */
  def partitionedSink(
      stream: DataFrame,
      path: String,
      checkpointDir: String,
      partitionCol: String = "issued_on"): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch
          .withColumn(partitionCol, col(partitionCol).cast("string"))
          .write.mode("append").partitionBy(partitionCol).parquet(path)
      }
}
