package graft
import graft.pipeline.ForecastPipeline
import graft.queries.{FloodQueries, FloodShaped, LlmQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the full forecast pipeline
    * (detailed forecast → control join → tendency/intensity/peak-timing →
    * geometry → relevance filter) over flood-shaped tables derived from the
    * testdata; returns the summary forecast. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val out = ForecastPipeline.run(
      FloodShaped.forecast(spark, dir),
      FloodShaped.thresholds(spark, dir))
    out.summary
  }

  /** One entry per implemented operator from SURVEY.md §2 (flood family)
    * plus the LLM-data-pipeline operators (dedup / similarity / text
    * analysis / multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    FloodQueries.queries ++ LlmQueries.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted only for non-SQL-expressible ops (driver then
    * records a weaker rows-only check). */
  def oracleSql: Map[String, String] =
    FloodQueries.oracles ++ LlmQueries.oracles
}
