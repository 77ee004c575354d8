package graft.config

/** Engine configuration constants.
  *
  * Values mirror the reference pipeline's configuration
  * (reference: databricks/config.json:14-48) but are plain Scala so the
  * engine carries no JSON/runtime-config dependency. Everything the
  * reference hardcodes (partition counts, precision) is parameterized here
  * so a 100 TB deployment can tune without code change.
  */
final case class FloodConfig(
    /** Grid resolution in degrees (reference: databricks/config.json:26). */
    resolution: Double = 0.05,
    /** Decimal places for lat/lon join-key rounding
      * (reference: databricks/config.json:27). */
    precision: Int = 3,
    /** Buffer divisor for area slicing (reference: databricks/config.json:28). */
    bufferDiv: Int = 4,
    /** Upstream drainage-area mask threshold, m^2
      * (reference: databricks/config.json:30). */
    upstreamThreshold: Double = 250000000.0,
    /** Return periods (years) with per-cell thresholds
      * (reference: databricks/config.json:14). */
    thresholdYears: Seq[Int] = Seq(2, 5, 20),
    /** Co-partitioning width for the join/agg keys. The reference hardcodes
      * 100 (databricks/glofas-forecast-computation.py:138,155,197); at
      * 100 TB this should be sized to ~128 MB shuffle blocks per partition.
      * <= 0 means "leave partitioning to AQE". */
    joinPartitions: Int = 0,
    /** Region of interest (reference: databricks/config.json:24-25). */
    roi: Roi = Roi(latMin = -6.0, latMax = 17.0, lonMin = -18.0, lonMax = 52.0)
) {
  def halfGridSize: Double = resolution / 2.0
  def buffer: Double = resolution / bufferDiv
}

final case class Roi(latMin: Double, latMax: Double, lonMin: Double, lonMax: Double)

/** Classification code tables (reference: databricks/config.json:31-46). */
object Codes {
  object Tendency {
    val Increasing = "U"
    val Stagnant = "C"
    val Decreasing = "D"
  }
  object Intensity {
    val Purple = "P"
    val Red = "R"
    val Yellow = "Y"
    val Gray = "G"
  }
  object PeakTiming {
    val BlackBorder = "BB"
    val GrayedColor = "GC"
    val GrayBorder = "GB"
  }
}
