package graft.queries

import graft.config.{FloodConfig, Roi}
import graft.model.Schemas
import graft.pipeline.{ForecastPipeline, ThresholdJoin}
import graft.transforms._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-facing flood-operator queries, one per SURVEY §2 operator family,
  * each with an exact DuckDB SQL mirror in [[oracles]].
  *
  * Exactness rules that keep the DuckDB hash-compare green (derived
  * empirically, see tools/check.py):
  *  - every fractional SQL literal that participates in double arithmetic
  *    is CAST(... AS DOUBLE) — DuckDB would otherwise keep it DECIMAL and
  *    produce a differently-rounded result than Spark's double math;
  *  - DuckDB `quantile_cont` is bit-identical to Spark's exact
  *    `percentile` (same Hyndman–Fan type-7 interpolation, verified);
  *  - ties in ranked windows are broken by an explicit trailing key
  *    (`step`), because hash-compare cannot tolerate engine-dependent
  *    tie resolution.
  */
object FloodQueries {

  private val cfg = FloodConfig()
  private val dayNs = 24L * 3600 * 1000 * 1000 * 1000
  private val t0Ns = 1696118400L * 1000000000L // 2023-10-01 00:00:00 UTC

  // ---------------------------------------------------------------- Spark side

  /** Exact-mode detailed forecast over the FloodShaped tables — the J1+P8+A1
    * core (reference: flood/spark/transforms.py:112-150). Cached: it fans
    * out into control/tendency/intensity/peak/summary queries, mirroring
    * the reference's `.cache()` (glofas-forecast-computation.py:169).
    * Memoized per (session, dir) so the fan-out shares ONE DataFrame —
    * structural reuse instead of relying on CacheManager's canonicalized
    * plan match (which worked, but re-registered the cache per query and
    * warned `Asked to cache already cached data` on every call). */
  private val detailedMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val pipelineMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), ForecastPipeline.Outputs]()
  private def detailed(s: SparkSession, dir: String): DataFrame =
    detailedMemo.computeIfAbsent((s, dir), { case (sess, d) =>
      ThresholdPercentages(
        FloodShaped.forecast(sess, d),
        FloodShaped.thresholds(sess, d),
        cfg.thresholdYears,
        // single-buffer exact quantiles; bit-identical to Exact (pinned by
        // FiveNumberSummarySpec), still matching DuckDB quantile_cont
        ThresholdPercentages.ExactOnePass).cache()
    })

  /** Drop every memoized plan built on `session`, unpersisting its cached
    * data — the lifecycle hook for a long-lived server embedding this
    * registry (the per-process bench/Verify mains never need it: their
    * memo dies with the JVM). Safe to call at any time; the next query
    * call rebuilds lazily. */
  def releaseMemos(session: SparkSession): Unit = {
    detailedMemo.entrySet().removeIf { e =>
      val hit = e.getKey._1 eq session
      if (hit) { e.getValue.unpersist(); () }
      hit
    }
    pipelineMemo.entrySet().removeIf { e =>
      val hit = e.getKey._1 eq session
      if (hit) e.getValue.release()
      hit
    }
  }

  /** Control slice: step-1 median as the control discharge
    * (reference: databricks/glofas-forecast-computation.py:180-182). */
  private def withControl(d: DataFrame): DataFrame = {
    val control = d
      .filter(col("step") === 1)
      .select(col("latitude"), col("longitude"), col("median_dis").as("control_dis"))
    d.join(control, Seq("latitude", "longitude"), "left")
  }

  /** Raw epoch-ns forecast rows (with jittered keys + null discharge rows)
    * for exercising Normalize end to end — what the GRIB→Parquet conversion
    * would hand the engine (reference: databricks/glofas-forecast-computation.py:98-106). */
  private def rawForecast(s: SparkSession, dir: String): DataFrame = {
    val li = s.read.parquet(s"$dir/lineitem.parquet")
    val latCenter = lit(-6.0) + floor(pmod(col("l_partkey"), lit(400)) / 20) * 0.05 + 0.025
    val lonCenter = lit(28.0) + pmod(pmod(col("l_partkey"), lit(400)), lit(20)) * 0.05 + 0.025
    val stepDays = pmod(col("l_orderkey"), lit(30)) + 1
    li.select(
      col("l_linenumber").cast("long").as("number"),
      (latCenter + (pmod(col("l_suppkey"), lit(7)) - 3) * 0.00001).as("latitude"),
      (lonCenter + (pmod(col("l_orderkey"), lit(5)) - 2) * 0.00001).as("longitude"),
      lit(t0Ns).as("time"),
      (stepDays * dayNs).cast("long").as("step"),
      (lit(t0Ns) + stepDays * dayNs).cast("long").as("valid_time"),
      when(col("l_tax") > 0.07, lit(null))
        .otherwise(col("l_quantity") * (lit(1.0) + col("l_discount")))
        .cast("float").as("dis24"))
  }

  /** Upstream drainage-area dimension with sub-cell jittered coordinates,
    * so the nearest-cell snap (J7) is actually exercised
    * (reference: flood/etl/filter_by_upstream.py:14-25). */
  private def uparea(s: SparkSession, dir: String): DataFrame = {
    val p = s.read.parquet(s"$dir/part.parquet")
    val latCenter = lit(-6.0) + floor(pmod(col("p_partkey"), lit(400)) / 20) * 0.05 + 0.025
    val lonCenter = lit(28.0) + pmod(pmod(col("p_partkey"), lit(400)), lit(20)) * 0.05 + 0.025
    p.select(
      round(latCenter + (pmod(col("p_size"), lit(5)) - 2) * 0.004, 3).as("latitude"),
      round(lonCenter + (pmod(col("p_partkey"), lit(3)) - 1) * 0.004, 3).as("longitude"),
      (pmod(col("p_size"), lit(10)).cast("double") * 50000000.0).as("uparea"))
  }

  /** Per-cell thresholds for the bigday GRIB fixture grid (8×6 cells at
    * 0.05°, lat-first 17.975 descending, lon-first −17.975 ascending —
    * tools/make_grib_bigday_fixture.py), built shuffle-free from a range.
    * `50 + 7·id` spans the fixture's 5..~380 value range so every
    * exceedance branch sees traffic; ×2/×5 for the rarer return periods.
    * SQL mirror: [[gribThresholdsSql]]. */
  private def clusteredThresholds(s: SparkSession): DataFrame =
    Normalize.roundKeys(
      s.range(8L * 6).select(
        (lit(17.975) - floor(col("id") / 8) * 0.05).as("latitude"),
        (lit(-17.975) + (col("id") % 8) * 0.05).as("longitude"),
        (lit(50.0) + col("id") * 7).as("threshold_2y"),
        ((lit(50.0) + col("id") * 7) * 2.0).as("threshold_5y"),
        ((lit(50.0) + col("id") * 7) * 5.0).as("threshold_20y")),
      cfg.precision)

  // ---------------------------------------------------------------- SQL side

  /** Shared CTE preamble mirroring the Spark-side derivations,
    * parameterized over the forecast/thresholds sources so both the
    * flood-shaped tables and the GRIB-fixture pipeline
    * (q_pipeline_clustered) share one SQL mirror of the whole stage. */
  private def pipelineSql(forecastSql: String, thresholdsSql: String): String =
    s"""WITH forecast AS ($forecastSql),
       |thresholds AS ($thresholdsSql),
       |detailed AS (
       |  SELECT f.latitude, f.longitude, f.issued_on, f.valid_for, f.step,
       |    AVG(CASE WHEN f.dis24 >= t.threshold_2y THEN 1 ELSE 0 END) AS p_above_2y,
       |    AVG(CASE WHEN f.dis24 >= t.threshold_5y THEN 1 ELSE 0 END) AS p_above_5y,
       |    AVG(CASE WHEN f.dis24 >= t.threshold_20y THEN 1 ELSE 0 END) AS p_above_20y,
       |    MIN(f.dis24) AS min_dis,
       |    quantile_cont(f.dis24, 0.25) AS Q1_dis,
       |    quantile_cont(f.dis24, 0.5) AS median_dis,
       |    quantile_cont(f.dis24, 0.75) AS Q3_dis,
       |    MAX(f.dis24) AS max_dis
       |  FROM forecast f LEFT JOIN thresholds t USING (latitude, longitude)
       |  GROUP BY 1, 2, 3, 4, 5),
       |control AS (
       |  SELECT latitude, longitude, median_dis AS control_dis FROM detailed WHERE step = 1),
       |dwc AS (
       |  SELECT d.*, c.control_dis
       |  FROM detailed d LEFT JOIN control c USING (latitude, longitude)),
       |tendency AS (
       |  SELECT *,
       |    CASE WHEN max_median_dis > control_dis * CAST(1.10 AS DOUBLE) THEN 'U'
       |         WHEN min_median_dis <= control_dis * CAST(0.90 AS DOUBLE)
       |              AND max_median_dis <= control_dis * CAST(1.10 AS DOUBLE) THEN 'D'
       |         ELSE 'C' END AS tendency
       |  FROM (
       |    SELECT latitude, longitude,
       |      MAX(median_dis) AS max_median_dis,
       |      MIN(median_dis) AS min_median_dis,
       |      MIN(control_dis) AS control_dis,
       |      MAX(max_dis) AS max_max_dis,
       |      MIN(min_dis) AS min_min_dis
       |    FROM dwc GROUP BY 1, 2)),
       |intensity AS (
       |  SELECT *,
       |    CASE WHEN max_p_above_20y >= 0.30 THEN 'P'
       |         WHEN max_p_above_5y >= 0.30 THEN 'R'
       |         WHEN max_p_above_2y >= 0.30 THEN 'Y'
       |         ELSE 'G' END AS intensity
       |  FROM (
       |    SELECT latitude, longitude,
       |      MAX(p_above_20y) AS max_p_above_20y,
       |      MAX(p_above_5y) AS max_p_above_5y,
       |      MAX(p_above_2y) AS max_p_above_2y
       |    FROM detailed GROUP BY 1, 2)),
       |peak AS (
       |  SELECT latitude, longitude, issued_on, peak_step, peak_day,
       |    CASE WHEN peak_step BETWEEN 1 AND 3 THEN 'BB'
       |         WHEN peak_step > 10 AND max_2y_start < 0.30 THEN 'GC'
       |         ELSE 'GB' END AS peak_timing
       |  FROM (
       |    SELECT latitude, longitude, issued_on, step AS peak_step, valid_for AS peak_day,
       |      max_2y_start,
       |      ROW_NUMBER() OVER (PARTITION BY latitude, longitude
       |                         ORDER BY condition ASC, median_dis DESC, step ASC) AS rn
       |    FROM (
       |      SELECT *,
       |        MAX(CASE WHEN step BETWEEN 1 AND 10 THEN p_above_2y END)
       |          OVER (PARTITION BY latitude, longitude) AS max_2y_start,
       |        CASE WHEN p_above_20y >= 0.3 THEN 1
       |             WHEN p_above_5y >= 0.3 THEN 2
       |             WHEN p_above_2y >= 0.3 THEN 3
       |             ELSE 4 END AS condition
       |      FROM detailed))
       |  WHERE rn = 1)""".stripMargin

  private val preamble: String =
    pipelineSql(FloodShaped.forecastSql, FloodShaped.thresholdsSql)

  /** The GRIB-fixture pipeline's input CTEs: the bigday mirror parquet
    * normalized exactly as [[graft.transforms.Normalize.fromGrib]]
    * (timezone-free date arithmetic — ref_time is midnight UTC), and the
    * same synthetic per-cell thresholds [[clusteredThresholds]] builds
    * (integer arithmetic on the cell id, exact in double both engines). */
  private lazy val gribForecastSql: String =
    s"""SELECT CAST(number AS BIGINT) AS number,
       |  ROUND(latitude, 3) AS latitude,
       |  ROUND(longitude, 3) AS longitude,
       |  DATE '1970-01-01' + CAST(ref_time / 86400 AS INTEGER) AS issued_on,
       |  CAST(CAST(step_hours AS DOUBLE) / 24 AS INTEGER) AS step,
       |  DATE '1970-01-01' + CAST(ref_time / 86400 AS INTEGER)
       |    + CAST(CAST(CAST(step_hours AS DOUBLE) / 24 AS INTEGER) - 1 AS INTEGER) AS valid_for,
       |  value AS dis24
       |FROM read_parquet('$gribBigdayExpected')
       |WHERE value IS NOT NULL""".stripMargin

  private val gribThresholdsSql: String =
    """SELECT
      |  ROUND(17.975 - FLOOR(id / 8) * 0.05, 3) AS latitude,
      |  ROUND(-17.975 + (id % 8) * 0.05, 3) AS longitude,
      |  50.0 + id * 7 AS threshold_2y,
      |  (50.0 + id * 7) * 2.0 AS threshold_5y,
      |  (50.0 + id * 7) * 5.0 AS threshold_20y
      |FROM (SELECT unnest(generate_series(0, 47)) AS id)""".stripMargin

  /** WKT polygon expression over `latitude`/`longitude` columns — mirrors
    * Geometry.addWkt's corner rounding and ring order
    * (reference: flood/spark/transforms.py:152-177). Spark's concat casts
    * doubles with Java Double.toString; DuckDB's VARCHAR cast produces the
    * same shortest-round-trip form for these magnitudes. */
  private def wktSql(half: Double = cfg.halfGridSize, prec: Int = cfg.precision): String = {
    def r(c: String, sign: String) = s"CAST(ROUND($c $sign CAST($half AS DOUBLE), $prec) AS VARCHAR)"
    val (minLat, maxLat) = (r("latitude", "-"), r("latitude", "+"))
    val (minLon, maxLon) = (r("longitude", "-"), r("longitude", "+"))
    s"'POLYGON ((' || $minLon || ' ' || $minLat || ',' || $minLon || ' ' || $maxLat || ',' || " +
      s"$maxLon || ' ' || $maxLat || ',' || $maxLon || ' ' || $minLat || ',' || " +
      s"$minLon || ' ' || $minLat || '))'"
  }

  private def snapSql(c: String): String =
    s"ROUND(FLOOR($c / CAST(0.05 AS DOUBLE)) * CAST(0.05 AS DOUBLE) + CAST(0.025 AS DOUBLE), 3)"

  /** Committed NetCDF fixture paths, resolved against the repo working dir
    * (Verify/Bench run from the repo root) so the oracle SQL dumped into
    * oracle_sql.json carries absolute paths DuckDB can open. */
  private lazy val netcdfFixture =
    new java.io.File("data/netcdf/thresholds.nc").getAbsolutePath
  private lazy val netcdfExpected =
    new java.io.File("data/netcdf/thresholds_expected.parquet").getAbsolutePath
  private lazy val gribFixture =
    new java.io.File("data/grib/forecast.grib2").getAbsolutePath
  private lazy val gribExpected =
    new java.io.File("data/grib/forecast_expected.parquet").getAbsolutePath
  private lazy val gribComplex =
    new java.io.File("data/grib/complex.grib2").getAbsolutePath
  private lazy val gribComplexExpected =
    new java.io.File("data/grib/complex_expected.parquet").getAbsolutePath
  private lazy val gribIeee =
    new java.io.File("data/grib/ieee.grib2").getAbsolutePath
  private lazy val gribIeeeExpected =
    new java.io.File("data/grib/ieee_expected.parquet").getAbsolutePath
  private lazy val gribPng =
    new java.io.File("data/grib/png.grib2").getAbsolutePath
  private lazy val gribPngExpected =
    new java.io.File("data/grib/png_expected.parquet").getAbsolutePath
  private lazy val gribCcsds =
    new java.io.File("data/grib/ccsds.grib2").getAbsolutePath
  private lazy val gribJ2k =
    new java.io.File("data/grib/j2k.grib2").getAbsolutePath
  private lazy val gribJ2kExpected =
    new java.io.File("data/grib/j2k_expected.parquet").getAbsolutePath
  private lazy val gribCcsdsExpected =
    new java.io.File("data/grib/ccsds_expected.parquet").getAbsolutePath
  private lazy val gribBigday =
    new java.io.File("data/grib/bigday.grib2").getAbsolutePath
  private lazy val gribBigdayExpected =
    new java.io.File("data/grib/bigday_expected.parquet").getAbsolutePath
  private lazy val netcdfSparseExpected =
    new java.io.File("data/netcdf/sparse2g_expected.parquet").getAbsolutePath
  private lazy val netcdfRecordFixture =
    new java.io.File("data/netcdf/timeseries.nc").getAbsolutePath
  private lazy val netcdfRecordExpected =
    new java.io.File("data/netcdf/timeseries_expected.parquet").getAbsolutePath
  private lazy val netcdf4Fixture =
    new java.io.File("data/netcdf/thresholds4.nc").getAbsolutePath
  private lazy val netcdf4Expected =
    new java.io.File("data/netcdf/thresholds4_expected.parquet").getAbsolutePath
  private lazy val netcdf4V2Fixture =
    new java.io.File("data/netcdf/discharge4_v2.nc").getAbsolutePath
  private lazy val netcdf4V2Expected =
    new java.io.File("data/netcdf/discharge4_v2_expected.parquet").getAbsolutePath
  private lazy val netcdf4DenseFixture =
    new java.io.File("data/netcdf/dense4.nc").getAbsolutePath
  private lazy val netcdf4DenseExpected =
    new java.io.File("data/netcdf/dense4_expected.parquet").getAbsolutePath
  private lazy val netcdf4ExtFixture =
    new java.io.File("data/netcdf/extarray4.nc").getAbsolutePath
  private lazy val netcdf4ExtExpected =
    new java.io.File("data/netcdf/extarray4_expected.parquet").getAbsolutePath
  private lazy val netcdf4DeepFixture =
    new java.io.File("data/netcdf/deepdense4.nc").getAbsolutePath
  private lazy val netcdf4DeepExpected =
    new java.io.File("data/netcdf/deepdense4_expected.parquet").getAbsolutePath
  private lazy val netcdf4HugeTinyFixture =
    new java.io.File("data/netcdf/hugetiny4.nc").getAbsolutePath
  private lazy val netcdf4HugeTinyExpected =
    new java.io.File("data/netcdf/hugetiny4_expected.parquet").getAbsolutePath
  private lazy val netcdf4VlenStrFixture =
    new java.io.File("data/netcdf/vlenstr4.nc").getAbsolutePath
  private lazy val netcdf4VlenStrExpected =
    new java.io.File("data/netcdf/vlenstr4_expected.parquet").getAbsolutePath

  // ---------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P2+P3+P6: key rounding, epoch-ns → date/step, NA-drop
    "q_normalize" -> ((s, dir) => Normalize.forecast(rawForecast(s, dir), cfg.precision)),

    // custom DataSourceV2: executor-generated cell grid (no input I/O)
    "q_grid_source" -> ((s, _) => s.read
      .format(classOf[graft.sources.GridSource].getName)
      .option("latMin", "-6").option("latMax", "-4")
      .option("lonMin", "28").option("lonMax", "31")
      .option("resolution", "0.05").option("numPartitions", "8")
      .load()),

    // coverage gap check: grid cells with NO threshold row (left_anti)
    "q_grid_coverage" -> ((s, dir) => {
      val grid = s.read
        .format(classOf[graft.sources.GridSource].getName)
        .option("latMin", "-6").option("latMax", "-4")
        .option("lonMin", "28").option("lonMax", "31")
        .option("resolution", "0.05").option("numPartitions", "8")
        .load()
      grid.join(FloodShaped.thresholds(s, dir), Seq("latitude", "longitude"), "left_anti")
    }),

    // S2+S3: NetCDF classic raster read directly as a table (the reference
    // pre-converts with python-netcdf4 + to_dataframe().reset_index(),
    // threshold-data-conversion.py:58-65; here the flatten IS the scan).
    // Fixture + its parquet mirror are committed under data/netcdf/,
    // generated by an independent python implementation of the public
    // CDF-1 spec (tools/make_netcdf_fixture.py).
    "q_netcdf_raster" -> ((s, _) => s.read
      .format(classOf[graft.sources.NetcdfSource].getName)
      .option("path", netcdfFixture)
      .option("numPartitions", "3")
      .load()),

    // The production slice: projected variables + outer-coordinate range +
    // the reference's dropna — pruning and slicing happen at the I/O layer
    // (NetcdfSourceSpec asserts the plan), the NULL filter via _FillValue.
    "q_netcdf_slice" -> ((s, _) => s.read
      .format(classOf[graft.sources.NetcdfSource].getName)
      .option("path", netcdfFixture)
      .option("variables", "threshold_2y,upstream_area")
      .option("numPartitions", "3")
      .load()
      .filter(col("lat") >= 17.8)
      .na.drop(Seq("threshold_2y"))),

    // S2 (NetCDF-4/HDF5): the reference's engine="netcdf4" aux rasters
    // (flood/etl/utils.py:8-14; uparea_glofas_v4_0.nc,
    // databricks/config.json:13) are HDF5 containers — read from-spec
    // behind the SAME NetcdfSource surface (superblock v0, v1 object
    // headers, symbol-table group, chunked shuffle+deflate and
    // deflate+fletcher32 layouts with edge chunks). Fixture + mirror by an
    // independent python implementation of the HDF5 spec
    // (tools/make_netcdf4_fixture.py; no HDF5 library exists here, so both
    // sides are from-spec). Columns reordered to the mirror's layout —
    // the container stores links name-sorted, semantics unchanged.
    "q_netcdf4_raster" -> ((s, _) => s.read
      .format(classOf[graft.sources.NetcdfSource].getName)
      .option("path", netcdf4Fixture)
      .option("numPartitions", "4")
      .load()
      .select("lat", "lon", "threshold_2y", "threshold_5y", "threshold_20y",
        "upstream_area")),

    // the production slice on the HDF5 container: projected variables +
    // outer-coordinate range + dropna — pruning and slicing reach the
    // chunk index (Netcdf4SourceSpec asserts the plan)
    "q_netcdf4_slice" -> ((s, _) => s.read
      .format(classOf[graft.sources.NetcdfSource].getName)
      .option("path", netcdf4Fixture)
      .option("variables", "threshold_2y,upstream_area")
      .option("numPartitions", "4")
      .load()
      .filter(col("lat") >= 17.5)
      .na.drop(Seq("threshold_2y"))
      .select("lat", "lon", "threshold_2y", "upstream_area")),

    // the libver-latest flavor: superblock v2, OHDR v2 object headers,
    // compact link messages, lookup3 checksums verified, phony dimension
    // (no coordinate variable → indices)
    "q_netcdf4_v2" -> ((s, _) => s.read
      .format(classOf[graft.sources.NetcdfSource].getName)
      .option("path", netcdf4V2Fixture)
      .option("numPartitions", "3")
      .load()),

    // dense (fractal-heap + v2 B-tree) group links — the storage libhdf5
    // switches to past the 8-link compact threshold, i.e. any netCDF-4
    // file with more than a handful of variables — plus data layout
    // message v4 chunk indexes (single chunk ±filter, implicit, fixed
    // array clients 0/1, one unallocated chunk → fill → NULL) mixed with
    // classic v3 layouts and an unsigned u2 variable (widened to int).
    // Fixture + mirror by the independent from-spec python writer
    // (tools/make_netcdf4_dense_fixture.py).
    "q_netcdf4_dense" -> ((s, _) => s.read
      .format(classOf[graft.sources.NetcdfSource].getName)
      .option("path", netcdf4DenseFixture)
      .option("numPartitions", "3")
      .load()
      .select("y", "x", "v_contig4", "v_compact4", "v_single",
        "v_single_filt", "v_implicit", "v_fixed", "v_fixed_filt",
        "v_btree1", "v_u2", "v_i8", "v_f8c", "v_i1")),

    // UNLIMITED-dimension NetCDF-4 (the shape every appended time-series
    // raster takes): extensible-array chunk indexes (inline / direct /
    // super-block / PAGED data blocks, default and tiny geometries),
    // v2-B-tree chunk indexes (record types 10/11, depth 1 and 2), PAGED
    // fixed arrays (clients 0/1, one uninitialized page), and a depth-2
    // v1 chunk B-tree; unallocated elements/blocks/pages -> fill -> NULL.
    // Fixture + mirror by the independent from-spec python writer
    // (tools/make_netcdf4_extarray_fixture.py).
    "q_netcdf4_extarray" -> ((s, _) => s.read
      .format(classOf[graft.sources.NetcdfSource].getName)
      .option("path", netcdf4ExtFixture)
      .option("numPartitions", "4")
      .load()
      .select("time", "y", "x", "v_ea", "v_ea_filt", "v_ea_sb",
        "v_ea_paged", "v_bt2", "v_bt2f", "v_btree1_deep", "v_paged_fa",
        "v_paged_fa_holes")),

    // LARGE dense-group shapes (the storage a root group accumulates at
    // thousands of links): fractal heap with NESTED indirect blocks (the
    // H5HF doubling-table rows past maxDirectRows, Undef slots included)
    // and a DEPTH-2 v2-B-tree name index — forced at fixture size by a
    // tiny from-spec geometry. Fixture + mirror by the independent python
    // writer (tools/make_netcdf4_deepdense_fixture.py).
    "q_netcdf4_deepdense" -> ((s, _) => s.read
      .format(classOf[graft.sources.NetcdfSource].getName)
      .option("path", netcdf4DeepFixture)
      .option("numPartitions", "2")
      .load()),

    // S2: fractal-heap HUGE and TINY objects — the last dense-group
    // storage classes (round 20): a TINY link riding inside its heap ID,
    // a HUGE-INDIRECT link (name past the managed cap, spilled raw and
    // indexed by the heap's type-1 v2 B-tree — the huge-linked variable
    // IS a result column), and a HUGE-DIRECT dense attribute
    // (address+length in the 17-byte ID) beside the load-bearing managed
    // DIMENSION_LIST (tools/make_netcdf4_hugetiny_fixture.py).
    "q_netcdf4_hugetiny" -> ((s, _) => s.read
      .format(classOf[graft.sources.NetcdfSource].getName)
      .option("path", netcdf4HugeTinyFixture)
      .option("numPartitions", "2")
      .load()),

    // S2: NC_STRING metadata (round 20) — the y scale's load-bearing
    // NAME/CLASS attributes are VLEN strings resolved through the global
    // heap, and the variable carries NC_STRING units/long_name the
    // reader frames and skips; a false reject here would lose the whole
    // raster (tools/make_netcdf4_vlenstr_fixture.py).
    "q_netcdf4_vlenstr" -> ((s, _) => s.read
      .format(classOf[graft.sources.NetcdfSource].getName)
      .option("path", netcdf4VlenStrFixture)
      .option("numPartitions", "2")
      .load()),

    // S1: GRIB2 ensemble forecast read directly as a table (the reference
    // opens GRIB via python-cfgrib, flood/etl/utils.py:3-14). Fixture =
    // shrunk GloFAS file (7 messages: deterministic + 3 members x 2 steps,
    // simple packing, one bitmap message), written by an independent
    // python implementation of the WMO spec (tools/make_grib_fixture.py).
    "q_grib_forecast" -> ((s, _) => s.read
      .format(classOf[graft.sources.GribSource].getName)
      .option("path", gribFixture)
      .option("numPartitions", "3")
      .load()),

    // The production slice: member/step predicates prune whole MESSAGES at
    // plan time (GribSourceSpec asserts the plan) — the reference's
    // filter_by_keys {dataType: pf} member split, at the I/O layer.
    "q_grib_member" -> ((s, _) => s.read
      .format(classOf[graft.sources.GribSource].getName)
      .option("path", gribFixture)
      .option("numPartitions", "3")
      .load()
      .filter(col("number").isNotNull && col("step_hours") === 24)),

    // Complex packing (DRS 5.2) and complex packing with spatial
    // differencing (5.3) — the encodings operational CDS/GloFAS GRIB2
    // commonly ships where the base fixture uses simple packing. The
    // fixture (tools/make_grib_complex_fixture.py, independent python
    // implementation of WMO FM 92 §5.2/5.3/7.2/7.3) covers first/second
    // order differencing, 2/3/4-octet descriptors, bitmaps, a constant
    // field (all group widths 0) and a short last group.
    "q_grib_complex" -> ((s, _) => s.read
      .format(classOf[graft.sources.GribSource].getName)
      .option("path", gribComplex)
      .option("numPartitions", "3")
      .load()),

    // IEEE floating point (DRS 5.4) — the NCEP-analysis "unpacked"
    // representation, and the one template whose r19 reject rationale
    // was wrong: section 7 is raw big-endian f32/f64 samples that widen
    // to the Double value column BIT-EXACTLY, so it is hash-checkable
    // like every packed template. The fixture
    // (tools/make_grib_ieee_fixture.py) covers f32 and f64 (built from
    // thirds/sevenths so a silent f32 narrowing would diverge), bitmaps,
    // and a constant field; precision 3 (f128) keeps a loud reject.
    "q_grib_ieee" -> ((s, _) => s.read
      .format(classOf[graft.sources.GribSource].getName)
      .option("path", gribIeee)
      .option("numPartitions", "3")
      .load()),

    // PNG packing (DRS 5.41) — the NCEP-side encoding (g2clib pngpack)
    // where CDS ships complex/simple. The fixture
    // (tools/make_grib_png_fixture.py, independent python implementation
    // of WMO FM 92 §5.41 + the PNG spec, deflate via CPython zlib vs the
    // JDK Inflater under test) covers 8/16-bit gray + 24-bit RGB +
    // 32-bit RGBA samples, 1-row-strip and grid raster layouts, all five
    // PNG filters, split IDAT with an ancillary chunk, a bitmap, and a
    // constant field.
    "q_grib_png" -> ((s, _) => s.read
      .format(classOf[graft.sources.GribSource].getName)
      .option("path", gribPng)
      .option("numPartitions", "3")
      .load()),

    // CCSDS/AEC lossless compression (DRS 5.42) — the ecCodes-side
    // default many operational ECMWF products ship. The fixture
    // (tools/make_grib_ccsds_fixture.py, from-spec CCSDS 121.0-B-2
    // encoder) covers 6/8/12/16-bit samples, preprocessor on/off,
    // references at RSI 1-8, zero-block runs incl. remainder-of-segment,
    // second-extension, sample-splitting and uncompressed blocks,
    // bitmap, and a constant field.
    "q_grib_ccsds" -> ((s, _) => s.read
      .format(classOf[graft.sources.GribSource].getName)
      .option("path", gribCcsds)
      .option("numPartitions", "3")
      .load()),

    // JPEG 2000 packing (DRS 5.40, LOSSLESS) — the last ecCodes packing,
    // decoded from spec since round 18: ITU-T T.800 MQ arithmetic coder,
    // EBCOT Tier-1 bit-plane passes, tag-tree packet headers, inverse
    // 5/3 reversible lifting (J2kDecoder.scala). The fixture
    // (tools/make_grib_j2k_fixture.py) carries a SELF-CHECKING from-spec
    // python encoder/decoder pair (no JPEG 2000 library exists here) and
    // covers 1-3 decomposition levels, 10-16-bit depths, small
    // code-blocks, and a bitmap message (compacted 1-row image, missing
    // cells -> NULL). LOSSY 5.40 keeps the loud index-time reject.
    "q_grib_jpeg" -> ((s, _) => s.read
      .format(classOf[graft.sources.GribSource].getName)
      .option("path", gribJ2k)
      .option("numPartitions", "3")
      .load()),

    // The full-ensemble-width day in ONE file: 51 members × 6 steps = 306
    // messages — past the 255 boundary a byte-sized index field would
    // silently wrap at, and past one-message-per-member assumptions.
    // Aggregated per (member, step) so the oracle checks every message
    // decoded (count + bit-exact sum), 306 rows out.
    // (sum is over value·20 — an exact integer by the packing parameters
    // (E=−1, D=1 → multiples of 1/20) — because a float SUM is addition-
    // order-sensitive and the gate compares exact.)
    "q_grib_bigday" -> ((s, _) => s.read
      .format(classOf[graft.sources.GribSource].getName)
      .option("path", gribBigday)
      .option("numPartitions", "5")
      .load()
      .groupBy(col("number"), col("step_hours"))
      .agg(
        count(lit(1)).as("cells"),
        sum(round(col("value") * 20).cast("long")).as("sum_scaled"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))),

    // CDF-2 with data variables past 2^31: the sparse fixture is written
    // on demand (SparseCdf2Fixture — git cannot carry the holes) and the
    // committed mirror is computed independently by
    // tools/make_netcdf_sparse_fixture.py. Projection + outer-dim slice +
    // NA-drop all land at I/O offsets > 2.5 GB.
    // Record (unlimited) dimension: time-series raster with TWO record
    // variables (slabs interleave per record — the strided-read path) plus
    // a record coordinate var; fixture tools/make_netcdf_record_fixture.py.
    "q_netcdf_record" -> ((s, _) => s.read
      .format(classOf[graft.sources.NetcdfSource].getName)
      .option("path", netcdfRecordFixture)
      .option("variables", "discharge,temp")
      .option("numPartitions", "3")
      .load()),

    "q_netcdf_sparse" -> ((s, _) => s.read
      .format(classOf[graft.sources.NetcdfSource].getName)
      .option("path", graft.sources.SparseCdf2Fixture.ensure())
      .option("variables", "discharge,uparea")
      .option("numPartitions", "3")
      .load()
      .filter(col("lat") >= 15.0)
      .na.drop(Seq("discharge"))),

    // U1: control + perturbed ensemble union
    "q_ensemble_union" -> ((s, dir) => {
      val pf = FloodShaped.forecast(s, dir)
      val cf = pf.filter(col("number") === 1).withColumn("number", lit(0L))
      EnsembleUnion(pf, cf, useControl = true)
    }),

    // J1+P8+A1: the detailed forecast (exact percentile mode)
    "q_threshold_percentages" -> ((s, dir) => detailed(s, dir)),

    // Production percentile path: mergeable percentile_approx sketches
    // (the 100 TB default — constant-size aggregation state vs the exact
    // mode's per-group value buffers). DuckDB has no matching sketch, so
    // the oracle is an INVARIANT check: it reads this dump back and keeps
    // only rows whose exact columns match recomputed exact aggregates and
    // whose quartiles are observed group elements within the sketch's
    // rank-error guarantee (see the oracle entry below).
    "q_detailed_approx" -> ((s, dir) =>
      ThresholdPercentages(
        FloodShaped.forecast(s, dir),
        FloodShaped.thresholds(s, dir),
        cfg.thresholdYears,
        ThresholdPercentages.Approx)),

    // J2: detailed ⨝ control discharge
    "q_detailed_control" -> ((s, dir) =>
      withControl(detailed(s, dir))
        .select("latitude", "longitude", "step", "median_dis", "control_dis")),

    // A2+P7: tendency classification
    "q_tendency" -> ((s, dir) => Tendency(withControl(detailed(s, dir)))),

    // J2 alternate branch: tendency against an EXTERNAL control forecast
    // (the read-yesterday's-control path, reference:
    // glofas-forecast-computation.py:185-191 / glofas-control-ETL.py)
    "q_tendency_external" -> ((s, dir) => {
      val external = FloodShaped.forecast(s, dir)
        .filter(col("number") === 1 && col("step") === 1)
        .select(col("latitude"), col("longitude"), col("dis24").as("control_dis"))
      Tendency(detailed(s, dir).join(external, Seq("latitude", "longitude"), "left"))
    }),

    // A3+P7: intensity classification
    "q_intensity" -> ((s, dir) => Intensity(detailed(s, dir))),

    // P4+A4+W1+P7: peak timing
    "q_peak_timing" -> ((s, dir) => PeakTiming(detailed(s, dir))),

    // J4+P11+P5: full summary forecast with geometry + relevance filter.
    // Uses the FUSED one-exchange stage (Summary.onePass) — the pipeline's
    // default since round 12 — so the oracle gates the fusion, while
    // q_tendency/q_intensity/q_peak_timing keep gating the standalone
    // operators it must stay bit-identical to (also pinned by SummarySpec).
    "q_summary_forecast" -> ((s, dir) => {
      val summary = Summary.onePass(withControl(detailed(s, dir)))
      Geometry.addWkt(summary, cfg.halfGridSize, cfg.precision)
        .filter(col("intensity") =!= "G")
    }),

    // J6: detailed restricted to the summary's surviving cells (left_semi)
    "q_detailed_restricted" -> ((s, dir) => {
      val d = detailed(s, dir)
      val surviving = Intensity(d).filter(col("intensity") =!= "G")
        .select("latitude", "longitude")
      d.join(surviving, Seq("latitude", "longitude"), "left_semi")
    }),

    // E1 END TO END as one bench/correctness entry: the whole daily
    // pipeline — threshold percentages (exact single-buffer mode, cached
    // fan-out), step-1-median control join, tendency/intensity/peak
    // summary, WKT geometry, relevance filter, and the detailed output
    // semi-joined to the summary's surviving cells. Times the DAG the
    // operational job actually runs, not its stages in isolation.
    // Memoized per (session, dir) like `detailed`: run() caches its
    // fan-out subplan and expects release() after consumption, which a
    // registry entry cannot call — one shared instance per session keeps
    // the CacheManager at a single pinned entry across bench's 3 runs;
    // the memo keeps the whole Outputs so [[releaseMemos]] can call its
    // release() when an embedding retires the session.
    "q_pipeline_e2e" -> ((s, dir) => pipelineMemo.computeIfAbsent((s, dir), {
      case (sess, d) =>
        ForecastPipeline.run(
          FloodShaped.forecast(sess, d),
          FloodShaped.thresholds(sess, d),
          cfg,
          mode = ThresholdPercentages.ExactOnePass)
    }).detailed),

    // E1 on the STEP-CLUSTERED read path, oracle-gated: the same daily
    // pipeline but ingesting the 306-message GRIB fixture through
    // ForecastPipeline.readGrib — the scan reports
    // KeyGroupedPartitioning(step_hours) and the detailed aggregation
    // plans with no fact-side exchange (ForecastPipelineSpec asserts the
    // plan; THIS entry hash-gates the results, so a regression in the
    // clustering report or the step_hours grouping that changed rows
    // would fail the driver gate, not just a local spec). Fixture-pathed
    // like the other q_grib entries (the sf dir has no GRIB).
    "q_pipeline_clustered" -> ((s, _) =>
      pipelineMemo.computeIfAbsent((s, s"grib-clustered:$gribBigday"), {
        case (sess, _) =>
          ForecastPipeline.run(
            ForecastPipeline.readGrib(sess, gribBigday, cfg, numPartitions = 4),
            clusteredThresholds(sess),
            cfg,
            mode = ThresholdPercentages.ExactOnePass)
      }).detailed),

    // P11: WKT polygon construction
    "q_geometry_wkt" -> ((s, dir) =>
      Geometry.addWkt(FloodShaped.thresholds(s, dir), cfg.halfGridSize, cfg.precision)),

    // Z-order (Morton) spatial layout key per cell
    "q_zorder" -> ((s, dir) => {
      val t = FloodShaped.thresholds(s, dir).select("latitude", "longitude")
      t.select(
        col("latitude"), col("longitude"),
        Geometry.cellIndex(col("latitude"), 90, 50).as("lat_idx"),
        Geometry.cellIndex(col("longitude"), 180, 50).as("lon_idx"))
        .withColumn("z", Geometry.zOrder(col("lat_idx"), col("lon_idx")))
    }),

    // J5+O1: threshold unification fold-join + global sort
    "q_threshold_join" -> ((s, dir) => {
      val t = FloodShaped.thresholds(s, dir)
      ThresholdJoin.run(Seq(
        t.select("latitude", "longitude", "threshold_2y"),
        t.select("latitude", "longitude", "threshold_5y"),
        t.select("latitude", "longitude", "threshold_20y")), cfg)
    }),

    // P9/J7: upstream-area mask via nearest-cell snap + semi-join
    "q_upstream_mask" -> ((s, dir) =>
      UpstreamFilter(FloodShaped.forecast(s, dir), uparea(s, dir),
        cfg.upstreamThreshold, cfg.resolution, cfg.precision)),

    // P10: region-of-interest slice with buffer
    "q_roi_slice" -> ((s, dir) =>
      UpstreamFilter.restrictArea(
        FloodShaped.forecast(s, dir),
        Roi(latMin = -6.0, latMax = -5.8, lonMin = 28.0, lonMax = 28.4),
        cfg.buffer)),

    // P12/J8: serving-side point lookup (cell + 8 neighbors)
    "q_cell_lookup" -> ((s, dir) =>
      Geometry.cellsContaining(FloodShaped.thresholds(s, dir),
        lat = -5.875, lon = 28.125, resolution = cfg.resolution, includeNeighbors = true))
  )

  val oracles: Map[String, String] = Map(
    "q_normalize" ->
      s"""SELECT CAST(l_linenumber AS BIGINT) AS number,
         |  ROUND(-6.0 + FLOOR((l_partkey % 400) / 20) * CAST(0.05 AS DOUBLE) + CAST(0.025 AS DOUBLE)
         |        + ((l_suppkey % 7) - 3) * CAST(0.00001 AS DOUBLE), 3) AS latitude,
         |  ROUND(28.0 + ((l_partkey % 400) % 20) * CAST(0.05 AS DOUBLE) + CAST(0.025 AS DOUBLE)
         |        + ((l_orderkey % 5) - 2) * CAST(0.00001 AS DOUBLE), 3) AS longitude,
         |  CAST((l_orderkey % 30) + 1 AS INTEGER) AS step,
         |  CAST(l_quantity * (1.0 + l_discount) AS REAL) AS dis24,
         |  DATE '2023-10-01' AS issued_on,
         |  DATE '2023-10-01' + CAST(l_orderkey % 30 AS INTEGER) AS valid_for
         |FROM lineitem WHERE l_tax <= 0.07""".stripMargin,

    "q_ensemble_union" ->
      s"""WITH forecast AS (${FloodShaped.forecastSql})
         |SELECT * FROM forecast
         |UNION ALL
         |SELECT CAST(0 AS BIGINT) AS number, latitude, longitude, issued_on, step, valid_for, dis24
         |FROM forecast WHERE number = 1""".stripMargin,

    "q_threshold_percentages" -> s"$preamble SELECT * FROM detailed",

    // Invariant oracle for the sketch-based quartiles: DuckDB reads the
    // Spark result back (__VERIFY_OUT__ is substituted with the dump dir
    // by graft.Verify) and re-emits exactly the rows that satisfy the
    // sketch's contract — exact columns (p_above_*, min, max) must equal
    // the recomputed exact aggregates, and each approx quartile must be
    // an OBSERVED group element whose rank window [cnt_lt+1, cnt_le]
    // intersects the target rank phi*(n-1)+1 within the GK guarantee
    // (eps*n, +1 rank slack for the phi*n vs phi*(n-1)+1 convention gap).
    // Any violation drops the row -> row-count mismatch -> red. A full
    // hash equality is impossible by nature (DuckDB has no equivalent
    // sketch), so this is the strongest checkable statement.
    "q_detailed_approx" -> {
      def rankOk(ltCol: String, leCol: String, phi: String): String =
        s"(r.$leCol > r.$ltCol" +
          s" AND r.$ltCol + 1 <= CAST($phi AS DOUBLE) * (x.n - 1) + 1 + (x.n * CAST(0.0001 AS DOUBLE) + 1)" +
          s" AND r.$leCol >= CAST($phi AS DOUBLE) * (x.n - 1) + 1 - (x.n * CAST(0.0001 AS DOUBLE) + 1))"
      s"""WITH forecast AS (${FloodShaped.forecastSql}),
         |thresholds AS (${FloodShaped.thresholdsSql}),
         |got AS (SELECT * FROM read_parquet('__VERIFY_OUT__/q_detailed_approx/*.parquet')),
         |joined AS (
         |  SELECT f.latitude, f.longitude, f.issued_on, f.valid_for, f.step, f.dis24,
         |    CASE WHEN f.dis24 >= t.threshold_2y THEN 1 ELSE 0 END AS e2,
         |    CASE WHEN f.dis24 >= t.threshold_5y THEN 1 ELSE 0 END AS e5,
         |    CASE WHEN f.dis24 >= t.threshold_20y THEN 1 ELSE 0 END AS e20
         |  FROM forecast f LEFT JOIN thresholds t USING (latitude, longitude)),
         |exact AS (
         |  SELECT latitude, longitude, issued_on, valid_for, step,
         |    AVG(e2) AS p2, AVG(e5) AS p5, AVG(e20) AS p20,
         |    MIN(dis24) AS mn, MAX(dis24) AS mx, count(*) AS n
         |  FROM joined GROUP BY 1, 2, 3, 4, 5),
         |ranks AS (
         |  SELECT g.latitude, g.longitude, g.issued_on, g.valid_for, g.step,
         |    count(*) FILTER (WHERE j.dis24 < g.Q1_dis) AS q1_lt,
         |    count(*) FILTER (WHERE j.dis24 <= g.Q1_dis) AS q1_le,
         |    count(*) FILTER (WHERE j.dis24 < g.median_dis) AS md_lt,
         |    count(*) FILTER (WHERE j.dis24 <= g.median_dis) AS md_le,
         |    count(*) FILTER (WHERE j.dis24 < g.Q3_dis) AS q3_lt,
         |    count(*) FILTER (WHERE j.dis24 <= g.Q3_dis) AS q3_le
         |  FROM got g JOIN joined j
         |    USING (latitude, longitude, issued_on, valid_for, step)
         |  GROUP BY 1, 2, 3, 4, 5)
         |SELECT g.* FROM got g
         |JOIN exact x USING (latitude, longitude, issued_on, valid_for, step)
         |JOIN ranks r USING (latitude, longitude, issued_on, valid_for, step)
         |WHERE g.p_above_2y = x.p2 AND g.p_above_5y = x.p5 AND g.p_above_20y = x.p20
         |  AND g.min_dis = x.mn AND g.max_dis = x.mx
         |  AND g.min_dis <= g.Q1_dis AND g.Q1_dis <= g.median_dis
         |  AND g.median_dis <= g.Q3_dis AND g.Q3_dis <= g.max_dis
         |  AND ${rankOk("q1_lt", "q1_le", "0.25")}
         |  AND ${rankOk("md_lt", "md_le", "0.5")}
         |  AND ${rankOk("q3_lt", "q3_le", "0.75")}""".stripMargin
    },

    "q_detailed_control" ->
      s"$preamble SELECT latitude, longitude, step, median_dis, control_dis FROM dwc",

    "q_tendency" ->
      s"""$preamble SELECT latitude, longitude, max_median_dis, min_median_dis,
         |control_dis, max_max_dis, min_min_dis, tendency FROM tendency""".stripMargin,

    "q_tendency_external" ->
      s"""$preamble,
         |ext AS (
         |  SELECT latitude, longitude, dis24 AS control_dis
         |  FROM forecast WHERE number = 1 AND step = 1),
         |dwe AS (
         |  SELECT d.*, e.control_dis
         |  FROM detailed d LEFT JOIN ext e USING (latitude, longitude)),
         |tende AS (
         |  SELECT *,
         |    CASE WHEN max_median_dis > control_dis * CAST(1.10 AS DOUBLE) THEN 'U'
         |         WHEN min_median_dis <= control_dis * CAST(0.90 AS DOUBLE)
         |              AND max_median_dis <= control_dis * CAST(1.10 AS DOUBLE) THEN 'D'
         |         ELSE 'C' END AS tendency
         |  FROM (
         |    SELECT latitude, longitude,
         |      MAX(median_dis) AS max_median_dis,
         |      MIN(median_dis) AS min_median_dis,
         |      MIN(control_dis) AS control_dis,
         |      MAX(max_dis) AS max_max_dis,
         |      MIN(min_dis) AS min_min_dis
         |    FROM dwe GROUP BY 1, 2))
         |SELECT latitude, longitude, max_median_dis, min_median_dis,
         |  control_dis, max_max_dis, min_min_dis, tendency FROM tende""".stripMargin,

    "q_intensity" ->
      s"""$preamble SELECT latitude, longitude, max_p_above_20y, max_p_above_5y,
         |max_p_above_2y, intensity FROM intensity""".stripMargin,

    "q_peak_timing" -> s"$preamble SELECT * FROM peak",

    "q_summary_forecast" ->
      s"""$preamble
         |SELECT p.*, t.max_median_dis, t.min_median_dis, t.control_dis,
         |  t.max_max_dis, t.min_min_dis, t.tendency,
         |  i.max_p_above_20y, i.max_p_above_5y, i.max_p_above_2y, i.intensity,
         |  ${wktSql()} AS wkt
         |FROM peak p
         |JOIN tendency t USING (latitude, longitude)
         |JOIN intensity i USING (latitude, longitude)
         |WHERE i.intensity <> 'G'""".stripMargin,

    "q_detailed_restricted" ->
      s"""$preamble
         |SELECT d.* FROM detailed d
         |WHERE EXISTS (SELECT 1 FROM intensity i
         |  WHERE i.latitude = d.latitude AND i.longitude = d.longitude
         |    AND i.intensity <> 'G')""".stripMargin,

    // The pipeline's detailed output: every cell of `detailed` whose
    // summary row survives the relevance filter, plus WKT. The semi-join
    // against the summary reduces to intensity <> 'G' because peak /
    // tendency / intensity each cover every detailed cell (inner joins
    // over the same grouping keys drop nothing).
    "q_pipeline_e2e" ->
      s"""$preamble
         |SELECT d.*, ${wktSql()} AS wkt FROM detailed d
         |WHERE EXISTS (SELECT 1 FROM intensity i
         |  WHERE i.latitude = d.latitude AND i.longitude = d.longitude
         |    AND i.intensity <> 'G')""".stripMargin,

    "q_pipeline_clustered" ->
      s"""${pipelineSql(gribForecastSql, gribThresholdsSql)}
         |SELECT d.*, ${wktSql()} AS wkt FROM detailed d
         |WHERE EXISTS (SELECT 1 FROM intensity i
         |  WHERE i.latitude = d.latitude AND i.longitude = d.longitude
         |    AND i.intensity <> 'G')""".stripMargin,

    "q_geometry_wkt" ->
      s"""WITH thresholds AS (${FloodShaped.thresholdsSql})
         |SELECT *, ${wktSql()} AS wkt FROM thresholds""".stripMargin,

    "q_grid_source" ->
      s"""SELECT
         |  ROUND(-6.0 + (i.i + CAST(0.5 AS DOUBLE)) * CAST(0.05 AS DOUBLE), 3) AS latitude,
         |  ROUND(28.0 + (j.j + CAST(0.5 AS DOUBLE)) * CAST(0.05 AS DOUBLE), 3) AS longitude
         |FROM (SELECT unnest(generate_series(0, 39)) AS i) i,
         |     (SELECT unnest(generate_series(0, 59)) AS j) j""".stripMargin,

    "q_grib_forecast" ->
      s"SELECT * FROM read_parquet('$gribExpected')",

    "q_grib_member" ->
      s"""SELECT * FROM read_parquet('$gribExpected')
         |WHERE number IS NOT NULL AND step_hours = 24""".stripMargin,

    "q_grib_complex" ->
      s"SELECT * FROM read_parquet('$gribComplexExpected')",

    "q_grib_ieee" ->
      s"SELECT * FROM read_parquet('$gribIeeeExpected')",

    "q_grib_png" ->
      s"SELECT * FROM read_parquet('$gribPngExpected')",

    "q_grib_ccsds" ->
      s"SELECT * FROM read_parquet('$gribCcsdsExpected')",

    "q_grib_jpeg" ->
      s"SELECT * FROM read_parquet('$gribJ2kExpected')",

    "q_grib_bigday" ->
      s"""SELECT number, step_hours, COUNT(*) AS cells,
         |  CAST(SUM(CAST(ROUND(value * 20) AS BIGINT)) AS BIGINT) AS sum_scaled,
         |  MIN(value) AS min_value, MAX(value) AS max_value
         |FROM read_parquet('$gribBigdayExpected')
         |GROUP BY number, step_hours""".stripMargin,

    "q_netcdf_record" ->
      s"SELECT * FROM read_parquet('$netcdfRecordExpected')",

    "q_netcdf_sparse" ->
      s"""SELECT lat, lon, discharge, uparea
         |FROM read_parquet('$netcdfSparseExpected')
         |WHERE lat >= CAST(15.0 AS DOUBLE) AND discharge IS NOT NULL""".stripMargin,

    "q_netcdf_raster" ->
      s"SELECT * FROM read_parquet('$netcdfExpected')",

    "q_netcdf4_raster" ->
      s"SELECT * FROM read_parquet('$netcdf4Expected')",

    "q_netcdf4_slice" ->
      s"""SELECT lat, lon, threshold_2y, upstream_area
         |FROM read_parquet('$netcdf4Expected')
         |WHERE lat >= CAST(17.5 AS DOUBLE) AND threshold_2y IS NOT NULL""".stripMargin,

    "q_netcdf4_v2" ->
      s"SELECT * FROM read_parquet('$netcdf4V2Expected')",

    "q_netcdf4_dense" ->
      s"SELECT * FROM read_parquet('$netcdf4DenseExpected')",

    "q_netcdf4_extarray" ->
      s"SELECT * FROM read_parquet('$netcdf4ExtExpected')",

    "q_netcdf4_deepdense" ->
      s"SELECT * FROM read_parquet('$netcdf4DeepExpected')",

    "q_netcdf4_hugetiny" ->
      s"SELECT * FROM read_parquet('$netcdf4HugeTinyExpected')",

    "q_netcdf4_vlenstr" ->
      s"SELECT * FROM read_parquet('$netcdf4VlenStrExpected')",

    "q_netcdf_slice" ->
      s"""SELECT lat, lon, threshold_2y, upstream_area
         |FROM read_parquet('$netcdfExpected')
         |WHERE lat >= CAST(17.8 AS DOUBLE) AND threshold_2y IS NOT NULL""".stripMargin,

    "q_grid_coverage" ->
      s"""WITH thresholds AS (${FloodShaped.thresholdsSql}),
         |grid AS (
         |  SELECT
         |    ROUND(-6.0 + (i.i + CAST(0.5 AS DOUBLE)) * CAST(0.05 AS DOUBLE), 3) AS latitude,
         |    ROUND(28.0 + (j.j + CAST(0.5 AS DOUBLE)) * CAST(0.05 AS DOUBLE), 3) AS longitude
         |  FROM (SELECT unnest(generate_series(0, 39)) AS i) i,
         |       (SELECT unnest(generate_series(0, 59)) AS j) j)
         |SELECT g.latitude, g.longitude FROM grid g
         |WHERE NOT EXISTS (SELECT 1 FROM thresholds t
         |  WHERE t.latitude = g.latitude AND t.longitude = g.longitude)""".stripMargin,

    "q_zorder" ->
      s"""WITH thresholds AS (${FloodShaped.thresholdsSql}),
         |idx AS (
         |  SELECT latitude, longitude,
         |    (CAST(ROUND(latitude * 1000) AS BIGINT) + 90000) // 50 AS lat_idx,
         |    (CAST(ROUND(longitude * 1000) AS BIGINT) + 180000) // 50 AS lon_idx
         |  FROM thresholds)
         |SELECT latitude, longitude, lat_idx, lon_idx,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(generate_series(0, 15), k ->
         |      ((lat_idx >> k) & 1) * (CAST(1 AS BIGINT) << (2*k + 1))
         |      + ((lon_idx >> k) & 1) * (CAST(1 AS BIGINT) << (2*k)))),
         |    (a, b) -> a + b) AS z
         |FROM idx""".stripMargin,

    "q_threshold_join" ->
      s"""WITH thresholds AS (${FloodShaped.thresholdsSql})
         |SELECT latitude, longitude, threshold_2y, threshold_5y, threshold_20y,
         |  ${wktSql()} AS wkt
         |FROM thresholds""".stripMargin,

    "q_upstream_mask" ->
      s"""WITH forecast AS (${FloodShaped.forecastSql}),
         |uparea AS (
         |  SELECT
         |    ROUND(-6.0 + FLOOR((p_partkey % 400) / 20) * CAST(0.05 AS DOUBLE) + CAST(0.025 AS DOUBLE)
         |          + ((p_size % 5) - 2) * CAST(0.004 AS DOUBLE), 3) AS latitude,
         |    ROUND(28.0 + ((p_partkey % 400) % 20) * CAST(0.05 AS DOUBLE) + CAST(0.025 AS DOUBLE)
         |          + ((p_partkey % 3) - 1) * CAST(0.004 AS DOUBLE), 3) AS longitude,
         |    CAST(p_size % 10 AS DOUBLE) * CAST(50000000.0 AS DOUBLE) AS uparea
         |  FROM part)
         |SELECT f.* FROM forecast f
         |WHERE EXISTS (SELECT 1 FROM uparea u
         |  WHERE u.uparea >= 250000000.0
         |    AND ${snapSql("u.latitude")} = ${snapSql("f.latitude")}
         |    AND ${snapSql("u.longitude")} = ${snapSql("f.longitude")})""".stripMargin,

    "q_roi_slice" -> {
      val b = cfg.buffer
      s"""WITH forecast AS (${FloodShaped.forecastSql})
         |SELECT * FROM forecast
         |WHERE latitude BETWEEN ${-6.0 - b} AND ${-5.8 + b}
         |  AND longitude BETWEEN ${28.0 - b} AND ${28.4 + b}""".stripMargin
    },

    "q_cell_lookup" -> {
      val reach = 1.5 * cfg.resolution
      s"""WITH thresholds AS (${FloodShaped.thresholdsSql})
         |SELECT * FROM thresholds
         |WHERE latitude BETWEEN ${-5.875 - reach} AND ${-5.875 + reach}
         |  AND longitude BETWEEN ${28.125 - reach} AND ${28.125 + reach}""".stripMargin
    }
  )
}
