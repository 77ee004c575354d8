package graft.transforms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-cell geometry helpers: WKT polygons for GIS serving and point→cell
  * snapping for the serving-side lookup.
  */
object Geometry {

  /** Append a `wkt` column with the cell's axis-aligned polygon.
    *
    * Semantics (reference: flood/spark/transforms.py:152-177): corners are
    * `round(lat/lon ± halfGridSize, precision)`, ring order
    * (minLon minLat, minLon maxLat, maxLon maxLat, maxLon minLat, close).
    * Golden strings pinned by test_spark_transforms.py:643-645. Pure
    * codegen'd string concat — no geometry library, no UDF.
    */
  def addWkt(df: DataFrame, halfGridSize: Double, precision: Int): DataFrame = {
    val minLat = round(col("latitude") - halfGridSize, precision)
    val maxLat = round(col("latitude") + halfGridSize, precision)
    val minLon = round(col("longitude") - halfGridSize, precision)
    val maxLon = round(col("longitude") + halfGridSize, precision)
    def pt(lon: Column, lat: Column): Column = concat(lon, lit(" "), lat)
    df.withColumn(
      "wkt",
      concat(
        lit("POLYGON (("),
        pt(minLon, minLat), lit(","),
        pt(minLon, maxLat), lit(","),
        pt(maxLon, maxLat), lit(","),
        pt(maxLon, minLat), lit(","),
        pt(minLon, minLat),
        lit("))")))
  }

  /** Snap a point coordinate to its containing grid cell's lower bound:
    * `floor(x / resolution) * resolution`, rounded to `precision`.
    * (reference: databricks/flood-api-examples.py:83-120, python-side) */
  def snapToCellFloor(c: Column, resolution: Double, precision: Int): Column =
    round(floor(c / resolution) * resolution, precision)

  /** Snap to the cell center (the engine's canonical cell key): lower
    * bound + half a cell. Aligning both sides of a join onto cell centers
    * replaces the reference's nearest-neighbor reindex on a regular grid
    * (reference: flood/etl/filter_by_upstream.py:21-23; regular-grid
    * assumption documented in SURVEY §2.3 J7). */
  def snapToCellCenter(c: Column, resolution: Double, precision: Int): Column =
    round(floor(c / resolution) * resolution + resolution / 2.0, precision)

  /** Serving-side point lookup: rows whose cell contains the point —
    * optionally the 8 neighboring cells too (reference:
    * databricks/flood-api-examples.py:195-221, geopandas intersects →
    * re-expressed as axis-aligned between-predicates, no geo lib). */
  def cellsContaining(
      df: DataFrame,
      lat: Double,
      lon: Double,
      resolution: Double,
      includeNeighbors: Boolean = false
  ): DataFrame = {
    val reach = if (includeNeighbors) 1.5 * resolution else 0.5 * resolution
    df.filter(
      col("latitude").between(lat - reach, lat + reach) &&
        col("longitude").between(lon - reach, lon + reach))
  }
}
