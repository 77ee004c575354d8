package graft

import graft.config.FloodConfig
import graft.pipeline.{ForecastPipeline, Sinks}
import graft.queries.FloodShaped
import graft.transforms.{Normalize, ThresholdPercentages}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-size E1 smoke (dev tool, not part of the driver contract): the
  * whole daily pipeline — inputs → threshold percentages → control join →
  * summary → geometry → relevance filter → partitioned parquet sinks.
  * Prints stage row counts, wall time and the driver JVM's peak RSS; any
  * stage failing or returning zero rows exits nonzero. This is the "would
  * the operational job run end to end at scale" check, distinct from the
  * per-operator correctness gate (sf0.01 DuckDB hashes) and the bench
  * (min-of-3 timings).
  *
  * Input mode: a GRIB glob argument (the `.grib2` glob under
  * tools/make_glofas_day.py's output) reads a RAW GRIB day (30 files ×
  * 51 members × 644k cells ≈ 985 M cells, the reference's full
  * operational scale) straight through [[graft.sources.GribSource]] +
  * `Normalize.fromGrib`, with per-cell thresholds synthesized on the
  * executors — measuring the whole day INCLUDING ingest, no parquet hop.
  * Without it, flood-shaped parquet at `SPARK_GRAFT_SF_DIR`.
  *
  * Percentile mode: `ExactOnePass` by default — the ensemble group is
  * bounded (≤51 members), so the one-buffer exact summary is both correct
  * and cheap at ANY corpus size (measured equivalent to sketches on the
  * full 985 M-cell day, BASELINE.md round-11 note); pass `approx` as any
  * argument to exercise the `percentile_approx` sketch path instead (the
  * right mode only when group WIDTH, not group count, grows). */
object ScaleSmoke {

  /** Per-cell return-period thresholds for the synthetic GloFAS grid
    * (tools/make_glofas_day.py geometry), generated distributed — 644k
    * rows, deterministic in the cell id, spanning the generator's 0..655
    * value range so the exceedance branches all see traffic. */
  private[graft] def syntheticThresholds(spark: SparkSession, precision: Int): DataFrame = {
    val ni = 1400L
    val nj = 460L
    Normalize.roundKeys(
      spark.range(ni * nj).select(
        (lit(17.975) - floor(col("id") / ni) * 0.05).as("latitude"),
        (lit(-17.975) + (col("id") % ni) * 0.05).as("longitude"),
        (lit(100.0) + (col("id") % 400).cast("double")).as("threshold_2y"),
        ((lit(100.0) + (col("id") % 400)) * 1.6).as("threshold_5y"),
        ((lit(100.0) + (col("id") % 400)) * 3.2).as("threshold_20y")),
      precision)
  }

  /** Driver JVM peak RSS (VmHWM) in MB; −1 outside Linux. Shared by the
    * profiling mains. */
  private[graft] def peakRssMb(): Long = {
    val src = scala.io.Source.fromFile("/proc/self/status")
    try src.getLines().collectFirst {
      case l if l.startsWith("VmHWM:") => l.split("\\s+")(1).toLong / 1024
    }.getOrElse(-1L)
    finally src.close()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Deliberately DEFAULT conf beyond the local-mode basics: the measured
    // scale plan (dimension broadcasts, one-pass summary, step-clustered
    // exchange-free aggregation) must come from the LIBRARY — explicit
    // broadcast() hints in ForecastPipeline.run, readGrib enabling the v2
    // bucketing flag itself — not from tool-side session tuning. Round-11
    // carried autoBroadcastJoinThreshold/bucketing conf here; round 12
    // graduated both into the pipeline, and this smoke proves it. The one
    // non-default line is `spark.sql.extensions` — the library's documented
    // install hook (cluster deployments set the same conf), which carries
    // the physical rewrites (CollapsePercentiles,
    // CompleteClusteredAggregate), not tuning values.
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", classOf[graft.functions.GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A/B attribution hook for the complete-mode rewrite (dev-only; the
    // library default is on — see CompleteClusteredAggregate.EnabledKey)
    sys.env.get("GRAFT_COMPLETE_AGG").foreach(v =>
      spark.conf.set(graft.plans.CompleteClusteredAggregate.EnabledKey, v))

    // Host-storm canary around the E1 measurement (the Bench.scala canary
    // applied to the full-day run, r20 verdict ask #5): the SAME trivial
    // lineitem aggregate sampled immediately before and after, so each E1
    // number carries its own host-window factor — three consecutive
    // rounds of E1 landed in storm windows and were unjudgeable without
    // it. min-of-5, quiet-window pin ~0.14-0.15 s (canary_min_cs 14-15).
    def canarySample(): Double = {
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        try spark.read.parquet(s"$sfDir/lineitem.parquet")
          .groupBy("l_returnflag")
          .agg(sum("l_quantity"), avg("l_extendedprice"), count(lit(1)))
          .count()
        catch { case _: Throwable => }
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val canaryBefore = canarySample()

    val cfg = FloodConfig()
    val outDir = java.nio.file.Files.createTempDirectory("e1smoke").toString
    val t0 = System.nanoTime()
    val (modeArgs, pathArgs) =
      args.partition(a => a == "approx" || a == "exact" || a == "plainsink")
    val (label, forecasts, thresholds) = pathArgs.headOption match {
      case Some(glob) => // raw GRIB day: ingest is part of the measurement.
        // readGrib = the library's step-clustered default: one partition
        // per leadtime with the clustering reported, daily-leadtime guard
        // included; run() groups on the carried step_hours automatically,
        // so the 985M-row pre-aggregation exchange disappears (the
        // day-job shape: 30 steps ≈ the core count; a multi-month corpus
        // would pass clusterByStep = false and keep cell-balanced slices)
        (glob, ForecastPipeline.readGrib(spark, glob, cfg, numPartitions = cpus.toInt),
          syntheticThresholds(spark, cfg.precision))
      case None =>
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        (sfDir, FloodShaped.forecast(spark, sfDir), FloodShaped.thresholds(spark, sfDir))
    }
    val mode =
      if (modeArgs.contains("approx")) ThresholdPercentages.Approx
      else ThresholdPercentages.ExactOnePass
    val out = ForecastPipeline.run(forecasts, thresholds, cfg, mode = mode)
    // both outputs written the way the daily job writes them: detailed
    // partitioned by issue date (hive layout), summary flat — Z-ordered
    // by default so serving-side bbox reads prune row groups (O1+);
    // `plainsink` writes unsorted, isolating the serving-layout cost in
    // the printed per-sink splits
    val zOrdered = !modeArgs.contains("plainsink")
    val tPipe = System.nanoTime()
    val detailedOut =
      out.detailed.withColumn("issued_on", col("issued_on").cast("string"))
    if (zOrdered)
      Sinks.writePartitionedZOrdered(detailedOut, s"$outDir/detailed", Seq("issued_on"))
    else Sinks.writePartitioned(detailedOut, s"$outDir/detailed", Seq("issued_on"))
    val tDetailed = System.nanoTime()
    if (zOrdered) Sinks.writeZOrdered(out.summary, s"$outDir/summary")
    else out.summary.write.mode("overwrite").parquet(s"$outDir/summary")
    val tSummary = System.nanoTime()
    out.release()
    val detailedRows = spark.read.parquet(s"$outDir/detailed").count()
    val summaryRows = spark.read.parquet(s"$outDir/summary").count()
    val secs = (System.nanoTime() - t0) / 1e9
    val canaryAfter = canarySample()
    // label honesty: the pipeline is lazy, so the first split is the whole
    // compute (scan→agg→join→geometry) PLUS the detailed write; only the
    // summary split is a from-cache stage
    println(f"E1 @ $label: detailed=$detailedRows rows, summary=$summaryRows rows, " +
      f"${secs}%.2f s (compute+detailed write ${(tDetailed - tPipe) / 1e9}%.2f s, " +
      f"summary stage ${(tSummary - tDetailed) / 1e9}%.2f s, zOrdered=$zOrdered), " +
      f"driver peak RSS ${peakRssMb()} MB, " +
      f"canary before/after ${canaryBefore}%.3f/${canaryAfter}%.3f s")
    spark.stop()
    require(detailedRows > 0 && summaryRows > 0, "E1 smoke produced an empty output")
  }
}
