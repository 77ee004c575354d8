package graft.pipeline

import graft.SparkSpec
import graft.config.{FloodConfig, Roi}
import graft.sources.{GribSource, NetcdfSource}
import graft.transforms.ThresholdPercentages
import org.apache.spark.sql.functions._

/** The reference's FULL daily flow with zero conversion hops: GRIB2
  * ensemble forecast (cfgrib in the reference, `flood/etl/utils.py:3-14`)
  * + NetCDF threshold rasters (netcdf4, `utils.py:8-14`) feed
  * [[ForecastPipeline.run]] directly through the custom DSv2 sources — the
  * end-to-end a reference user runs as
  * fetch → transform(GRIB→parquet) → join(NetCDF→parquet) → compute,
  * collapsed to read → compute. */
class RasterPipelineSpec extends SparkSpec {

  private val gribPath = new java.io.File("data/grib/forecast.grib2").getAbsolutePath
  private val ncPath = new java.io.File("data/netcdf/thresholds.nc").getAbsolutePath

  test("GRIB ensemble + NetCDF thresholds drive the full forecast pipeline") {
    // forecast side: perturbed members only (the reference's filter_by_keys
    // {dataType: pf} split) — message-level pruning in the source — then
    // the Normalize-shape projection: 3-decimal key rounding, epoch→date,
    // hour steps → day steps
    val grib = spark.read.format(classOf[GribSource].getName)
      .option("path", gribPath).option("numPartitions", "3").load()
      .filter(col("number").isNotNull)
    val forecast = graft.transforms.Normalize.fromGrib(grib, 3)

    // threshold side: raster → table IS the scan; the reference's dropna
    // (raster_converter.py:44) is a plain null filter on the fill cells
    val thresholds = spark.read.format(classOf[NetcdfSource].getName)
      .option("path", ncPath)
      .option("variables", "threshold_2y,threshold_5y,threshold_20y").load()
      .na.drop(Seq("threshold_2y"))
      .select(
        round(col("lat"), 3).as("latitude"),
        round(col("lon"), 3).as("longitude"),
        col("threshold_2y").cast("double").as("threshold_2y"),
        col("threshold_5y"), col("threshold_20y"))

    val cfg = FloodConfig(roi = Roi(17.7, 18.0, -18.0, -17.5))
    val out = ForecastPipeline.run(forecast, thresholds, cfg,
      mode = ThresholdPercentages.Exact)

    // 48 cells minus the 5 _FillValue cells (no threshold → never exceeds →
    // Gray intensity → dropped by the relevance semi-join), × 2 steps
    val detailed = out.detailed
    assert(detailed.count() == 86)
    assert(detailed.filter(
      col("p_above_2y") < 0 || col("p_above_2y") > 1 ||
        col("p_above_5y") < 0 || col("p_above_5y") > 1).count() == 0)

    // hand-checked cell (grid idx 1 → lat row 0, lon col 1): members decode
    // to 13.7 / 20.7 / 27.7 at step 1, so the ensemble median is 20.7
    val cell = detailed.filter(
      col("latitude") === 17.975 && col("longitude") === -17.925 && col("step") === 1)
      .select("median_dis").collect()
    assert(cell.length == 1 && cell.head.getDouble(0) == 20.7)

    // summary computes tendency/intensity/peak + WKT geometry end-to-end
    val summary = out.summary
    assert(summary.count() > 0)
    assert(summary.columns.contains("wkt"))
    assert(summary.select("intensity").distinct().count() >= 1)
    out.release()
  }

  test("E2 threshold preparation runs from per-return-period NetCDF rasters") {
    // the reference's one-time flow: one raster file per return period →
    // join into the unified per-cell threshold table
    // (threshold-data-joining.py:70-131) — here each raster is read by the
    // DSv2 source directly, no parquet conversion
    import graft.sources.{CdfTestWriter, NetcdfSource}
    val dir = java.nio.file.Files.createTempDirectory("thresholds")
    val (na, nb) = (4, 3)
    val lats = (0 until na).map(i => 10.975 - i * 0.05)
    val lons = (0 until nb).map(j => 3.025 + j * 0.05)
    val files = Seq("2y" -> 10.0, "5y" -> 20.0, "20y" -> 40.0).map { case (rp, base) =>
      CdfTestWriter.write(s"$dir/rp$rp.nc", version = 1,
        dims = Seq("lat" -> na, "lon" -> nb),
        vars = Seq(
          CdfTestWriter.V("lat", Seq(0), 6, lats),
          CdfTestWriter.V("lon", Seq(1), 6, lons),
          CdfTestWriter.V(s"threshold_$rp", Seq(0, 1), 6,
            (0 until na * nb).map(c => base + c))))
      s"$dir/rp$rp.nc"
    }
    val rasters = files.map { f =>
      val df = spark.read.format(classOf[NetcdfSource].getName).option("path", f).load()
      val cols = Seq(col("lat").as("latitude"), col("lon").as("longitude")) ++
        df.columns.filter(_.startsWith("threshold_")).map(col)
      df.select(cols: _*)
    }
    val unified = ThresholdJoin.run(rasters, FloodConfig(), validate = true)
    assert(unified.count() == na * nb)
    assert(Seq("threshold_2y", "threshold_5y", "threshold_20y", "wkt")
      .forall(unified.columns.contains))
    // spot-check one cell carries all three periods consistently
    val row = unified.filter(col("latitude") === 10.975 && col("longitude") === 3.025)
      .select("threshold_2y", "threshold_5y", "threshold_20y").head
    assert((row.getDouble(0), row.getDouble(1), row.getDouble(2)) == (10.0, 20.0, 40.0))
  }
}
