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
      /** Optional DDL fragment overriding per-column SQL types on create,
        * e.g. `"issued_on VARCHAR(10)"` — without it some dialects map
        * StringType to a LOB type (Derby/Postgres → CLOB/TEXT) that can't
        * be indexed or compared, which matters for anything queried. */
      createTableColumnTypes: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite)

  /** Configured JDBC writer; call `.save()` to execute. Split from the
    * action so callers (and tests) can compose without a live database. */
  def jdbcWriter(df: DataFrame, cfg: JdbcConfig): DataFrameWriter[Row] = {
    val w = df.coalesce(cfg.numPartitions)
      .write
      .mode(cfg.mode)
      .format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", cfg.table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("batchsize", cfg.batchSize)
      .option("isolationLevel", "READ_COMMITTED")
    cfg.createTableColumnTypes.fold(w)(w.option("createTableColumnTypes", _))
  }

  def writeJdbc(df: DataFrame, cfg: JdbcConfig): Unit = jdbcWriter(df, cfg).save()

  /** Parquet sink used everywhere else (snappy is Spark's default codec,
    * matching the reference's explicit choice —
    * flood/etl/raster_converter.py:8-10). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Hive-style partitioned Parquet sink — the Spark-native form of the
    * reference's date-partitioned folder layout
    * (databricks/glofas-transform.py:62-63): `partitionBy("issued_on")`
    * gives `issued_on=YYYY-MM-DD/` directories that daily jobs overwrite
    * per-partition (`partitionOverwriteMode=dynamic` replaces only the
    * partitions present in `df`, so one day's rerun never truncates
    * history) and readers prune via partition filters before any I/O. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
