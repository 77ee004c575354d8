package graft.pipeline

import graft.config.{Codes, FloodConfig}
import graft.model.Schemas
import graft.transforms._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The daily forecast pipeline, end to end: raw forecast Parquet + threshold
  * Parquet → (detailed forecast, summary forecast), both with WKT geometry.
  *
  * Orchestration mirrors the reference driver
  * (reference: databricks/glofas-forecast-computation.py:124-280):
  *
  *   read+normalize → detailed = threshold-percentages (cached: the subplan
  *   fans out into control slice, tendency, intensity, peak timing, and the
  *   final write) → control join → summary = tendency ⨝ intensity ⨝ peak
  *   → add geometry → relevance filter (intensity ≠ gray) → detailed
  *   semi-joined to the summary's surviving cells.
  *
  * Scale posture: all joins and aggregations key on the rounded
  * (latitude, longitude); `cfg.joinPartitions > 0` forces explicit
  * co-partitioning like the reference's `repartition(100, lat, lon)`
  * (glofas-forecast-computation.py:138,155,197), the default (0) leaves
  * partition planning to AQE, which re-plans from runtime shuffle sizes —
  * the right default for anything from 60k rows to 100 TB. The threshold
  * dimension table is auto-broadcast by Catalyst when below the broadcast
  * threshold.
  */
object ForecastPipeline {

  /** Pipeline outputs plus a handle to release the cached shared subplan —
    * in a long-lived session repeated runs would otherwise pin storage
    * memory (the reference is a one-shot notebook where this can't bite).
    * Call `release()` after both outputs are written/consumed. */
  final case class Outputs(detailed: DataFrame, summary: DataFrame, release: () => Unit)

  def readForecast(spark: SparkSession, path: String, cfg: FloodConfig): DataFrame =
    Normalize.forecast(spark.read.schema(Schemas.rawForecast).parquet(path), cfg.precision)

  def readThresholds(spark: SparkSession, path: String, cfg: FloodConfig): DataFrame =
    Normalize.roundKeys(spark.read.schema(Schemas.thresholds).parquet(path), cfg.precision)

  /** Control-discharge reader: yesterday's 24 h (step-1) forecast as the
    * per-cell control (reference: databricks/glofas-control-ETL.py:77-79,
    * glofas-forecast-computation.py:185-191). The input is the
    * control-member parquet the control ETL produces (single ensemble
    * member, like the reference's `control.parquet`). Pass the result as
    * [[run]]'s `controlForecast` instead of the step-1-median default. */
  def readControl(spark: SparkSession, path: String, cfg: FloodConfig): DataFrame =
    readForecast(spark, path, cfg)
      .filter(col("step") === 1)
      .select(col("latitude"), col("longitude"), col("dis24").cast("double").as("control_dis"))

  private def copartition(df: DataFrame, cfg: FloodConfig): DataFrame =
    if (cfg.joinPartitions > 0) df.repartition(cfg.joinPartitions, col("latitude"), col("longitude"))
    else df

  /** Run the pipeline on already-normalized inputs. `controlForecast`:
    * None = use the step-1 median as control (USE_FIRST_AS_CONTROL,
    * reference: glofas-forecast-computation.py:180-191). */
  def run(
      forecasts: DataFrame,
      thresholds: DataFrame,
      cfg: FloodConfig = FloodConfig(),
      controlForecast: Option[DataFrame] = None,
      mode: ThresholdPercentages.AccuracyMode = ThresholdPercentages.Approx,
      extraGroupCols: Seq[String] = Nil // see ThresholdPercentages.apply
  ): Outputs = {
    val detailed = ThresholdPercentages(
      copartition(forecasts, cfg),
      copartition(thresholds, cfg),
      cfg.thresholdYears,
      mode,
      extraGroupCols
    ).cache()

    val control = controlForecast.getOrElse(
      detailed
        .filter(col("step") === 1)
        .select("latitude", "longitude", "median_dis")
        .withColumnRenamed("median_dis", "control_dis"))

    val detailedWithControl =
      detailed.join(copartition(control, cfg), Seq("latitude", "longitude"), "left")

    val summary = PeakTiming(detailed)
      .join(Tendency(detailedWithControl), Seq("latitude", "longitude"), "inner")
      .join(Intensity(detailed), Seq("latitude", "longitude"), "inner")

    val summaryGeo =
      Geometry.addWkt(summary, cfg.halfGridSize, cfg.precision)
        .filter(col("intensity") =!= Codes.Intensity.Gray)

    val detailedGeo =
      Geometry.addWkt(detailed, cfg.halfGridSize, cfg.precision)
        .join(summaryGeo.select("latitude", "longitude"), Seq("latitude", "longitude"), "left_semi")

    Outputs(detailedGeo, summaryGeo, () => { detailed.unpersist(); () })
  }

  def write(out: Outputs, detailedPath: String, summaryPath: String): Unit = {
    out.detailed.write.mode("overwrite").parquet(detailedPath)
    out.summary.write.mode("overwrite").parquet(summaryPath)
    out.release()
  }
}
