package graft.pipeline

import graft.transforms.Geometry
import org.apache.spark.sql.{Column, DataFrame, DataFrameWriter, Row, SaveMode}
import org.apache.spark.sql.functions.col

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

  /** The serving tables' Morton sort key over the rounded (latitude,
    * longitude) grid keys. `cellMillideg` = grid resolution in
    * milli-degrees (50 = the GloFAS 0.05° grid). */
  private def zKey(cellMillideg: Int, bits: Int): Column =
    Geometry.zOrder(
      Geometry.cellIndex(col("latitude"), 90, cellMillideg),
      Geometry.cellIndex(col("longitude"), 180, cellMillideg),
      bits)

  /** Z-ordered Parquet serving sink: globally range-sorts the rows by the
    * Morton key of their grid cell before writing, so every output file
    * AND every parquet row group covers a compact spatial tile — a bbox
    * read (the serving API's access pattern,
    * reference: databricks/flood-api-examples.py:83-120) prunes to
    * O(perimeter) row groups via min/max stats on BOTH coordinates,
    * instead of the full-latitude stripes a plain (lat, lon) sort leaves
    * (the reference's layout, threshold-data-joining.py:120 — upgraded
    * here; SinksSpec measures the difference). The key column is derived,
    * sorted on, and dropped — the serving schema is unchanged.
    *
    * At scale the global sort is one range exchange of the serving table
    * (per-cell rows, dimension-sized relative to the fact data) —
    * sampled range boundaries keep output files balanced regardless of
    * spatial density skew. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      cellMillideg: Int = 50,
      bits: Int = 16,
      /** Writer passthrough (e.g. `parquet.block.size` to size row groups
        * — the pruning granule — independently of the session). */
      options: Map[String, String] = Map.empty): Unit =
    df.withColumn("__graft_z", zKey(cellMillideg, bits))
      .orderBy("__graft_z")
      .drop("__graft_z")
      .write.mode(SaveMode.Overwrite).options(options).parquet(path)

  /** Flat parquet with each task's rows LOCALLY z-sorted — no shuffle, no
    * range sampling. The right z form for FACT-SIZED outputs: per-file
    * tiles already give the full row-group pruning a vanilla parquet
    * reader can use (see [[writePartitionedZOrdered]]'s rationale);
    * [[writeZOrdered]]'s global sort is for dimension-sized serving
    * tables, where its extra pass is cheap and whole-file clustering
    * helps table formats that skip files. */
  def writeZOrderedLocal(
      df: DataFrame,
      path: String,
      cellMillideg: Int = 50,
      bits: Int = 16,
      options: Map[String, String] = Map.empty): Unit =
    df.withColumn("__graft_z", zKey(cellMillideg, bits))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode(SaveMode.Overwrite).options(options).parquet(path)

  /** Hive-partitioned + Z-ordered: [[writePartitioned]]'s layout (daily
    * jobs overwrite only their own `issued_on=` partitions) with each
    * task's rows LOCALLY sorted by (partition key, Morton key) — no
    * shuffle, no range-sampling pass.
    *
    * Local, not global, on purpose: a plain parquet reader prunes at ROW
    * GROUP granularity only (it never skips whole files on data-column
    * min/max), so per-file z-tiling already yields the full pruning win —
    * every file's row groups cover compact tiles and a bbox read touches
    * O(perimeter) groups per file. A global `repartitionByRange` would
    * additionally cluster FILES (worth it under a table format that
    * file-skips, e.g. via [[writeZOrdered]]'s global sort for flat
    * serving tables) but costs a full extra pass (range sampling) plus a
    * wide-row shuffle of the entire output — measured at ~25% of the E1
    * day's wall for zero extra pruning on the vanilla reader. */
  def writePartitionedZOrdered(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      cellMillideg: Int = 50,
      bits: Int = 16,
      options: Map[String, String] = Map.empty): Unit = {
    val keys = partitionCols.map(col) :+ col("__graft_z")
    df.withColumn("__graft_z", zKey(cellMillideg, bits))
      .sortWithinPartitions(keys: _*)
      .drop("__graft_z")
      .write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .options(options)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
