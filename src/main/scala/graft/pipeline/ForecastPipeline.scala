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
  *   fans out into control slice, the fused summary stage, and the final
  *   write) → control join → summary = tendency + intensity + peak timing
  *   in ONE aggregation pass ([[graft.transforms.Summary.onePass]])
  *   → add geometry → relevance filter (intensity ≠ gray) → detailed
  *   semi-joined to the summary's surviving cells.
  *
  * Scale posture — this is the DEFAULT plan, no session conf required:
  *  - The threshold and control tables are per-cell DIMENSIONS (~1 row per
  *    grid cell, 644k rows ≈ 25 MB at full GloFAS scale — reference:
  *    databricks/threshold-data-joining.py:78-81) and carry explicit
  *    `broadcast()` hints, so the fact side never shuffles for a join no
  *    matter what `autoBroadcastJoinThreshold` the session runs with.
  *  - The summary stage is one exchange (one `groupBy(lat, lon)` pass),
  *    not three aggregations re-joined.
  *  - When the forecast frame carries the raw `step_hours` attribute (the
  *    [[readGrib]] step-clustered path), the detailed aggregation groups on
  *    it too, letting the scan's reported `KeyGroupedPartitioning` delete
  *    the pipeline's only fact-sized exchange — measured 2.6× on a full
  *    985 M-cell operational day (BASELINE.md round-11).
  *  - All remaining joins and aggregations key on the rounded
  *    (latitude, longitude); `cfg.joinPartitions > 0` forces explicit
  *    co-partitioning like the reference's `repartition(100, lat, lon)`
  *    (glofas-forecast-computation.py:138,155,197), the default (0) leaves
  *    partition planning to AQE.
  */
object ForecastPipeline {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Pipeline outputs plus a handle to release the cached shared subplan —
    * in a long-lived session repeated runs would otherwise pin storage
    * memory (the reference is a one-shot notebook where this can't bite).
    * Call `release()` after both outputs are written/consumed. */
  final case class Outputs(detailed: DataFrame, summary: DataFrame, release: () => Unit)

  def readForecast(spark: SparkSession, path: String, cfg: FloodConfig): DataFrame =
    Normalize.forecast(spark.read.schema(Schemas.rawForecast).parquet(path), cfg.precision)

  def readThresholds(spark: SparkSession, path: String, cfg: FloodConfig): DataFrame =
    Normalize.roundKeys(spark.read.schema(Schemas.thresholds).parquet(path), cfg.precision)

  /** Read a raw GRIB forecast day straight off the drop directory with the
    * measured scale plan as the default: one partition per leadtime with
    * the clustering REPORTED to Catalyst (`partitionByStep` →
    * `KeyGroupedPartitioning(step_hours)`), so [[run]]'s detailed
    * aggregation plans with no fact-sized exchange — the members of every
    * (cell, step) group never leave their step's partition.
    *
    * Enables `spark.sql.sources.v2.bucketing.enabled` on the session when
    * off (it is off in a default session, and without it Spark discards
    * any DSv2-reported clustering): this path's whole point is the
    * reported clustering, so requiring a manual conf would re-create the
    * tool-only-plan problem. The flag must still be set when the query
    * PLANS (action time), so it cannot be save/restored around this call —
    * it stays on for the session, logged when toggled. Blast radius is
    * narrow by construction: the flag only changes plans for DSv2 scans
    * that REPORT a partitioning, which in this library is exactly the
    * opt-in `partitionByStep` GRIB scan this method creates.
    *
    * Guards: the `step_hours` grouping rides on `step = step_hours/24`
    * being 1:1, true only for DAILY leadtimes — sub-daily data fails
    * loudly here. The check asks the DRIVER-SIDE message index
    * ([[graft.sources.GribSource.distinctStepHours]]) — with
    * `indexCacheDir` set it is a KB sidecar read, and either way it is
    * zero Spark jobs, not a scan+distinct over the cluster — instead of
    * silently emitting finer-grained detailed rows. `clusterByStep =
    * false` falls back to cell-balanced slices (the right shape when a
    * glob spans many days and the distinct step count would cap
    * parallelism). */
  def readGrib(
      spark: SparkSession,
      glob: String,
      cfg: FloodConfig,
      numPartitions: Int = 0,
      clusterByStep: Boolean = true,
      indexCacheDir: Option[String] = None): DataFrame = {
    if (clusterByStep) {
      val key = "spark.sql.sources.v2.bucketing.enabled"
      if (!spark.conf.get(key, "false").toBoolean) {
        log.info(s"enabling $key: the step-clustered GRIB read reports a " +
          "KeyGroupedPartitioning that Catalyst otherwise discards")
        spark.conf.set(key, "true")
      }
    }
    val parts =
      if (numPartitions > 0) numPartitions else spark.sparkContext.defaultParallelism
    val reader = spark.read
      .format(classOf[graft.sources.GribSource].getName)
      .option("path", glob)
      .option("numPartitions", parts)
      .option("partitionByStep", clusterByStep.toString)
    val grib = indexCacheDir.fold(reader)(d => reader.option("indexCacheDir", d)).load()
    if (!clusterByStep) return Normalize.fromGrib(grib, cfg.precision)
    // the guard is answered by the DRIVER-SIDE message index (the same
    // sidecar read when indexCacheDir is set) — no scan+distinct Spark job
    val subDaily = graft.sources.GribSource
      .distinctStepHours(glob, indexCacheDir).filter(_ % 24 != 0)
    require(subDaily.isEmpty,
      s"step-clustered read requires daily leadtimes; found sub-daily steps " +
        s"${subDaily.sorted.mkString(", ")}h in '$glob' — pass " +
        "clusterByStep = false for this input")
    // certify the guard on the column so run() need not re-scan: daily
    // leadtimes make step = step_hours/24 1:1 by construction
    Normalize.fromGrib(grib, cfg.precision, keepStepHours = true)
      .withMetadata("step_hours", new org.apache.spark.sql.types.MetadataBuilder()
        .putBoolean(StepHoursVerifiedKey, true).build())
  }

  /** Column-metadata key certifying `step_hours` was verified 1:1 with the
    * derived `step` (the [[readGrib]] daily guard) — lets [[run]] trust
    * the frame without a second verification pass over the fact data.
    *
    * The stamp certifies the SOURCE, not every derived frame: column
    * metadata survives transformations, so a caller who composes a
    * certified frame with data that breaks the invariant (e.g. a union
    * with a sub-daily frame) carries a stale certificate. Such
    * compositions are out of contract — strip the metadata or pass
    * `extraGroupCols` explicitly (`Some(Nil)` disables the clustering,
    * `Some(Seq("step_hours"))` re-asserts it) when deriving frames whose
    * step mapping you changed. */
  private[pipeline] val StepHoursVerifiedKey = "graft.stepHoursDaily"

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
    * reference: glofas-forecast-computation.py:180-191).
    *
    * A forecast frame carrying `step_hours` (the [[readGrib]] clustered
    * path) automatically appends it to the detailed grouping so the
    * scan-reported clustering satisfies the aggregation's distribution —
    * guarded: the grouping is only sound when `step_hours` is 1:1 with the
    * derived `step`, so auto-detection VERIFIES that (one narrow distinct
    * over the (step, step_hours) pairs — header-only on a GRIB scan) and
    * fails loudly on e.g. sub-daily data, where silently grouping finer
    * would emit duplicate detailed rows with wrong probabilities.
    * `extraGroupCols`: `None` = the auto-detection above; `Some(Nil)` =
    * force NO extra grouping (skips the check and the clustering);
    * `Some(cols)` = explicit extras, caller owns the constancy contract
    * (see [[ThresholdPercentages.apply]]). */
  def run(
      forecasts: DataFrame,
      thresholds: DataFrame,
      cfg: FloodConfig = FloodConfig(),
      controlForecast: Option[DataFrame] = None,
      mode: ThresholdPercentages.AccuracyMode = ThresholdPercentages.Approx,
      extraGroupCols: Option[Seq[String]] = None
  ): Outputs = {
    val groupExtras = extraGroupCols.getOrElse {
      if (!forecasts.columns.contains("step_hours")) Nil
      else if (forecasts.schema("step_hours").metadata.contains(StepHoursVerifiedKey) &&
          forecasts.schema("step_hours").metadata.getBoolean(StepHoursVerifiedKey))
        Seq("step_hours") // readGrib certified — see StepHoursVerifiedKey contract
      else {
        val pairs = forecasts.select(col("step"), col("step_hours"))
          .distinct().collect()
        val split = pairs.groupBy(_.get(0)).filter(_._2.length > 1)
        require(split.isEmpty,
          s"step_hours is not 1:1 with step (steps ${split.keys.mkString(", ")} " +
            "each map to several step_hours values — sub-daily leadtimes?); " +
            "grouping on it would split (cell, step) groups. Pass " +
            "extraGroupCols = Some(Nil) to run without the step clustering, " +
            "or ingest via readGrib(clusterByStep = false).")
        Seq("step_hours")
      }
    }
    val detailed = ThresholdPercentages(
      copartition(forecasts, cfg),
      broadcast(thresholds), // per-cell dimension: never shuffle the fact side
      cfg.thresholdYears,
      mode,
      groupExtras
    ).cache()

    val control = controlForecast.getOrElse(
      detailed
        .filter(col("step") === 1)
        .select("latitude", "longitude", "median_dis")
        .withColumnRenamed("median_dis", "control_dis"))

    val detailedWithControl =
      CellKey.join(detailed, broadcast(control), "left")

    val summary = Summary.onePass(detailedWithControl)

    val summaryGeo =
      Geometry.addWkt(summary, cfg.halfGridSize, cfg.precision)
        .filter(col("intensity") =!= Codes.Intensity.Gray)

    // the surviving-cell set is per-cell (≤ one row per grid cell) —
    // dimension-sized by construction, so the detailed side stays in place
    val detailedGeo =
      CellKey.join(
        Geometry.addWkt(detailed, cfg.halfGridSize, cfg.precision),
        broadcast(summaryGeo.select("latitude", "longitude")),
        "left_semi")

    Outputs(detailedGeo, summaryGeo, () => { detailed.unpersist(); () })
  }

  /** Persist both outputs in the serving layout — the engine's upgrade of
    * the reference's plain (lat, lon) sort-before-persist (O1,
    * threshold-data-joining.py:120), so serving-side bbox reads prune to
    * O(perimeter) row groups. The FACT-sized detailed table gets the
    * shuffle-free local z-sort (per-file tiles — identical row-group
    * pruning to a global sort on a vanilla reader, measured ~25% of the
    * full day's wall cheaper, BASELINE.md round 12); the per-cell summary
    * gets the global sort, cheap at its size. Daily jobs that
    * hive-partition by issue date use [[Sinks.writePartitionedZOrdered]]
    * directly (ScaleSmoke shape). */
  def write(out: Outputs, detailedPath: String, summaryPath: String): Unit = {
    Sinks.writeZOrderedLocal(out.detailed, detailedPath)
    Sinks.writeZOrdered(out.summary, summaryPath)
    out.release()
  }
}
