package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic flood-shaped tables derived from the driver's TPC-H-ish
  * testdata (TESTDATA.md). The flood pipeline's inputs are ensemble
  * forecasts + per-cell thresholds; the testdata has neither, so we derive
  * them with pure column arithmetic — every expression here has an exact
  * ANSI-SQL mirror in [[graft.SparkEntry.oracleSql]], which is what makes
  * the full pipeline oracle-checkable in DuckDB.
  *
  * Grid: 400 cells (20×20) of 0.05°, centers at −6.0+0.025 + k·0.05 lat,
  * 28.0+0.025 + k·0.05 lon — the reference's grid geometry
  * (databricks/config.json:24-27) at toy extent.
  */
object FloodShaped {

  /** Ensemble forecast rows from lineitem:
    * cell = l_partkey % 400, member = l_linenumber, step = 1 + l_orderkey % 30,
    * dis24 = l_quantity * (1 + l_discount), issued 2023-10-01.
    */
  def forecast(spark: SparkSession, sfDir: String): DataFrame = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.select(
      col("l_linenumber").cast("long").as("number"),
      round(lit(-6.0) + floor(pmod(col("l_partkey"), lit(400)) / 20) * 0.05 + 0.025, 3).as("latitude"),
      round(lit(28.0) + pmod(pmod(col("l_partkey"), lit(400)), lit(20)) * 0.05 + 0.025, 3).as("longitude"),
      to_date(lit("2023-10-01")).as("issued_on"),
      (pmod(col("l_orderkey"), lit(30)) + 1).cast("long").as("step"),
      date_add(to_date(lit("2023-10-01")), (pmod(col("l_orderkey"), lit(30))).cast("int")).as("valid_for"),
      (col("l_quantity") * (lit(1.0) + col("l_discount"))).as("dis24"))
  }

  /** Per-cell thresholds from part: one row per distinct cell,
    * threshold_2y = 25 + cell % 20, 5y = +12, 20y = +30. */
  def thresholds(spark: SparkSession, sfDir: String): DataFrame = {
    val p = spark.read.parquet(s"$sfDir/part.parquet")
    p.select(pmod(col("p_partkey"), lit(400)).cast("int").as("cell"))
      .distinct()
      .select(
        round(lit(-6.0) + floor(col("cell") / 20) * 0.05 + 0.025, 3).as("latitude"),
        round(lit(28.0) + pmod(col("cell"), lit(20)) * 0.05 + 0.025, 3).as("longitude"),
        (lit(25.0) + pmod(col("cell"), lit(20))).as("threshold_2y"),
        (lit(37.0) + pmod(col("cell"), lit(20))).as("threshold_5y"),
        (lit(55.0) + pmod(col("cell"), lit(20))).as("threshold_20y"))
  }

  /** The SQL mirrors of the above, as DuckDB CTE bodies. */
  val forecastSql: String =
    """SELECT CAST(l_linenumber AS BIGINT) AS number,
      |  ROUND(-6.0 + FLOOR((l_partkey % 400) / 20) * 0.05 + 0.025, 3) AS latitude,
      |  ROUND(28.0 + ((l_partkey % 400) % 20) * 0.05 + 0.025, 3) AS longitude,
      |  DATE '2023-10-01' AS issued_on,
      |  CAST((l_orderkey % 30) + 1 AS BIGINT) AS step,
      |  DATE '2023-10-01' + CAST((l_orderkey % 30) AS INTEGER) AS valid_for,
      |  l_quantity * (1.0 + l_discount) AS dis24
      |FROM lineitem""".stripMargin

  val thresholdsSql: String =
    """SELECT
      |  ROUND(-6.0 + FLOOR(cell / 20) * 0.05 + 0.025, 3) AS latitude,
      |  ROUND(28.0 + (cell % 20) * 0.05 + 0.025, 3) AS longitude,
      |  25.0 + (cell % 20) AS threshold_2y,
      |  37.0 + (cell % 20) AS threshold_5y,
      |  55.0 + (cell % 20) AS threshold_20y
      |FROM (SELECT DISTINCT CAST(p_partkey % 400 AS INTEGER) AS cell FROM part)""".stripMargin
}
