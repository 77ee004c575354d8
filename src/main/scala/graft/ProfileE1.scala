package graft

import graft.config.FloodConfig
import graft.pipeline.{ForecastPipeline, Sinks}
import graft.transforms.{Geometry, Summary, ThresholdPercentages}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-level timing of the full-day E1 pipeline, so "where do
  * the seconds go" is measured, not guessed (the round-13 planning
  * input). Each stage re-derives its frame fresh (no cache), and each
  * timing FORCES the columns it claims to measure — a bare `count()`
  * lets column pruning skip the value decode entirely, so decode-bearing
  * stages aggregate over the decoded column instead.
  *
  *   ProfileE1 '<glob>'   — e.g. the tools/make_glofas_day.py output glob
  *   (needs SPARK_DRIVER_MEM=48g like ScaleSmoke)
  */
object ProfileE1 {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileE1 <grib glob>")
    val glob = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", classOf[graft.functions.GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-42s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val cfg = FloodConfig()

    // 1. raw scan, metadata-only rows (bitmap popcount path, no payload)
    val raw = spark.read.format(classOf[graft.sources.GribSource].getName)
      .option("path", glob).option("numPartitions", cpus).load()
    t("scan rows (no value decode)")(raw.count())
    // 2. raw scan + full payload decode (sum forces the value column)
    t("scan + value decode")(raw.agg(sum("value")).collect())

    // step-clustered normalized frame + per-cell dimension, the E1 inputs
    val forecasts = t("readGrib (index + daily guard)")(
      ForecastPipeline.readGrib(spark, glob, cfg, numPartitions = cpus.toInt))
    val thresholds = ScaleSmoke.syntheticThresholds(spark, cfg.precision)

    // 3. decode + normalize + broadcast join + exceedance, NO aggregation
    t("decode+normalize+join+indicators") {
      forecasts.join(broadcast(thresholds), Seq("latitude", "longitude"), "left")
        .select(sum(when(col("dis24") >= col("threshold_2y"), 1).otherwise(0)))
        .collect()
    }

    // 3b. decomposition of stage 3, to locate the cost inside it:
    //     normalize only (no join), then join variants
    t("  normalize only (sum dis24)")(
      forecasts.select(sum("dis24")).collect())
    t("  normalize, no date columns") {
      val raw2 = spark.read.format(classOf[graft.sources.GribSource].getName)
        .option("path", glob).option("numPartitions", cpus)
        .option("partitionByStep", "true").load()
      raw2.na.drop(Seq("value")).select(
        round(col("latitude"), 3).as("latitude"),
        round(col("longitude"), 3).as("longitude"),
        col("value").as("dis24"))
        .select(sum("dis24")).collect()
    }
    t("  join on the two double keys (no dates)") {
      val raw2 = spark.read.format(classOf[graft.sources.GribSource].getName)
        .option("path", glob).option("numPartitions", cpus)
        .option("partitionByStep", "true").load()
      val slim = raw2.na.drop(Seq("value")).select(
        round(col("latitude"), 3).as("latitude"),
        round(col("longitude"), 3).as("longitude"),
        col("value").as("dis24"))
      slim.join(broadcast(thresholds), Seq("latitude", "longitude"), "left")
        .select(sum(when(col("dis24") >= col("threshold_2y"), 1).otherwise(0)))
        .collect()
    }
    t("  join on one packed long key (no dates)") {
      val raw2 = spark.read.format(classOf[graft.sources.GribSource].getName)
        .option("path", glob).option("numPartitions", cpus)
        .option("partitionByStep", "true").load()
      def cellId(lat: org.apache.spark.sql.Column, lon: org.apache.spark.sql.Column) =
        (round(lat * 1000).cast("long") + 90000L) * 720000L +
          (round(lon * 1000).cast("long") + 180000L)
      val slim = raw2.na.drop(Seq("value")).select(
        cellId(col("latitude"), col("longitude")).as("cell_id"),
        col("value").as("dis24"))
      val dims = thresholds.select(
        cellId(col("latitude"), col("longitude")).as("cell_id"),
        col("threshold_2y"))
      slim.join(broadcast(dims), Seq("cell_id"), "left")
        .select(sum(when(col("dis24") >= col("threshold_2y"), 1).otherwise(0)))
        .collect()
    }

    // 4. the detailed aggregation itself (exchange-free, one pass),
    //    forcing every aggregate output so nothing is pruned
    def detailed(mode: ThresholdPercentages.AccuracyMode) =
      ThresholdPercentages(forecasts, broadcast(thresholds),
        cfg.thresholdYears, mode, Seq("step_hours"))
    t("detailed agg, ExactOnePass")(
      detailed(ThresholdPercentages.ExactOnePass)
        .select(sum("median_dis"), sum("p_above_2y"), sum("min_dis"),
          sum("max_dis"), sum("Q1_dis"), sum("Q3_dis")).collect())
    t("detailed agg, Approx sketches")(
      detailed(ThresholdPercentages.Approx)
        .select(sum("median_dis"), sum("p_above_2y")).collect())

    // 4b. would grouping on the packed cell key (unpacking lat/lon after
    //     the agg) beat grouping on the two doubles + two dates? measures
    //     the candidate before any product code changes
    t("detailed agg, grouped on packed key") {
      val joined = graft.transforms.CellKey.join(forecasts, broadcast(thresholds), "left")
        .withColumn("__cell", graft.transforms.CellKey.pack(col("latitude"), col("longitude")))
      val grouped = joined.groupBy("__cell", "step_hours")
        .agg(
          mean(when(col("dis24") >= col("threshold_2y"), 1).otherwise(0)).as("p2"),
          graft.functions.FiveNumberSummary(col("dis24")).as("fns"))
      grouped.select(sum("p2"), sum(col("fns.median"))).collect()
    }

    // 5. downstream-of-agg stages, from a materialized detailed frame so
    //    they are measured WITHOUT re-paying the 985M-row aggregation
    val det = t("detailed materialize (cache)") {
      val d = detailed(ThresholdPercentages.ExactOnePass).cache()
      d.count(); d
    }
    t("summary one-pass (from cache)") {
      val control = det.filter(col("step") === 1)
        .select(col("latitude"), col("longitude"), col("median_dis").as("control_dis"))
      Summary.onePass(det.join(broadcast(control), Seq("latitude", "longitude"), "left"))
        .select(count(lit(1)), sum(col("peak_step"))).collect()
    }
    t("WKT projection (from cache)")(
      Geometry.addWkt(det, cfg.halfGridSize, cfg.precision)
        .select(sum(length(col("wkt")))).collect())
    val outDir = java.nio.file.Files.createTempDirectory("e1prof").toString
    t("plain parquet write (from cache)")(
      Geometry.addWkt(det, cfg.halfGridSize, cfg.precision)
        .write.mode("overwrite").parquet(s"$outDir/plain"))
    t("local z-sorted write (from cache)")(
      Sinks.writeZOrderedLocal(
        Geometry.addWkt(det, cfg.halfGridSize, cfg.precision), s"$outDir/z"))
    det.unpersist()

    println(s"driver peak RSS ${ScaleSmoke.peakRssMb()} MB")
    spark.stop()
  }
}
