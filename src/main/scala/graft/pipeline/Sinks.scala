package graft.pipeline

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SaveMode}

/** Output sinks beyond the Parquet default.
  *
  * The reference sketches (commented out) a PostgreSQL sink for both
  * forecast outputs (reference: databricks/glofas-forecast-computation.py:
  * 325-347). This is the Spark-native equivalent: `df.write.jdbc` with the
  * knobs that matter at scale — `numPartitions` caps concurrent DB
  * connections (a 1000-executor cluster would otherwise open a connection
  * per task and melt the database), `batchsize` amortizes round-trips.
  */
object Sinks {

  final case class JdbcConfig(
      url: String,
      table: String,
      user: String,
      password: String,
      /** Max concurrent writer connections (coalesces before write). */
      numPartitions: Int = 8,
      /** Rows per INSERT batch. */
      batchSize: Int = 10000,
      mode: SaveMode = SaveMode.Overwrite)

  /** Configured JDBC writer; call `.save()` to execute. Split from the
    * action so callers (and tests) can compose without a live database. */
  def jdbcWriter(df: DataFrame, cfg: JdbcConfig): DataFrameWriter[Row] =
    df.coalesce(cfg.numPartitions)
      .write
      .mode(cfg.mode)
      .format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", cfg.table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("batchsize", cfg.batchSize)
      .option("isolationLevel", "READ_COMMITTED")

  def writeJdbc(df: DataFrame, cfg: JdbcConfig): Unit = jdbcWriter(df, cfg).save()

  /** Parquet sink used everywhere else (snappy is Spark's default codec,
    * matching the reference's explicit choice —
    * flood/etl/raster_converter.py:8-10). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)
}
