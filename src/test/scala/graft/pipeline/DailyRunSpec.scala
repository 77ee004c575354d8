package graft.pipeline

import graft.SparkSpec
import graft.config.FloodConfig
import graft.queries.FloodShaped
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Two-day operational loop: day 1 writes raw + partitioned outputs; day 2
  * reads day 1's control member and runs with it — the reference's daily
  * cadence (control ETL feeding the next day's computation) wired through
  * this engine's readers, pipeline, and partitioned sink. */
class DailyRunSpec extends SparkSpec {

  test("day-2 run consumes day-1's control parquet via readControl") {
    val cfg = FloodConfig()
    val dir = Files.createTempDirectory("daily").toString
    val sfDir = "/root/testdata/sf0.001"

    // day 1: the control ETL's output — a single-member raw forecast file
    // in the epoch-ns physical schema (reference control.parquet shape)
    val dayNs = 24L * 3600 * 1000 * 1000 * 1000
    val t0Ns = 1696118400L * 1000000000L
    val day1Raw = FloodShaped.forecast(spark, sfDir)
      .filter(col("number") === 1)
      .select(
        col("number"),
        col("latitude"), col("longitude"),
        lit(t0Ns).as("time"),
        (col("step") * dayNs).as("step"),
        (lit(t0Ns) + col("step") * dayNs).as("valid_time"),
        col("dis24").cast("float").as("dis24"))
    day1Raw.write.mode("overwrite").parquet(s"$dir/control")

    // day 2: full ensemble run, control from yesterday's file
    val control = ForecastPipeline.readControl(spark, s"$dir/control", cfg)
    assert(control.count() > 0)
    assert(control.columns.toSeq == Seq("latitude", "longitude", "control_dis"))

    val out = ForecastPipeline.run(
      FloodShaped.forecast(spark, sfDir),
      FloodShaped.thresholds(spark, sfDir),
      cfg,
      controlForecast = Some(control))
    val summary = out.summary
    assert(summary.count() > 0)
    // the tendency classification actually used the external control
    assert(summary.select("tendency").distinct().count() >= 1)

    // partitioned write of the daily output, day-partition layout
    Sinks.writePartitioned(
      out.detailed.withColumn("issued_on", col("issued_on").cast("string")),
      s"$dir/detailed", Seq("issued_on"))
    out.release()
    val readBack = spark.read.parquet(s"$dir/detailed")
    assert(readBack.count() == out.detailed.count())
  }
}
