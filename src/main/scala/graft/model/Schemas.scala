package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for the engine's persisted boundaries.
  *
  * Declared (not inferred) to skip schema inference on read and make column
  * pruning explicit — mirrors the reference's deliberate explicit read
  * schema (reference: databricks/glofas-forecast-computation.py:98-106).
  */
object Schemas {

  /** Raw forecast rows as written by the upstream GRIB→Parquet conversion:
    * epoch-ns longs for time/step/valid_time, float discharge.
    * (reference: databricks/glofas-forecast-computation.py:98-106) */
  val rawForecast: StructType = StructType(Seq(
    StructField("number", LongType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("time", LongType),
    StructField("step", LongType),
    StructField("valid_time", LongType),
    StructField("dis24", FloatType)
  ))

  /** Unified per-cell return-period thresholds
    * (reference: databricks/threshold-data-joining.py:78-100). */
  val thresholds: StructType = StructType(Seq(
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("threshold_2y", DoubleType),
    StructField("threshold_5y", DoubleType),
    StructField("threshold_20y", DoubleType)
  ))

  /** Upstream drainage-area dimension (reference: flood/etl/filter_by_upstream.py:14-25). */
  val upstreamArea: StructType = StructType(Seq(
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("uparea", DoubleType)
  ))
}

/** Typed row models for the engine's core tables (read/write boundaries;
  * transforms themselves stay in untyped column-expression space, the
  * idiomatic and codegen-friendly form). */
final case class ForecastPoint(
    number: Long,
    latitude: Double,
    longitude: Double,
    time: Long,
    step: Long,
    valid_time: Long,
    dis24: Float
)

final case class Threshold(
    latitude: Double,
    longitude: Double,
    threshold_2y: Double,
    threshold_5y: Double,
    threshold_20y: Double
)
