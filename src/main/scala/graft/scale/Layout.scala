package graft.scale

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage-layout helpers: bucketed tables for shuffle-free co-located
  * joins and aggregations.
  *
  * At 100 TB the dominant cost of the forecast⨝threshold or
  * posting⨝posting joins is the shuffle. Writing both sides bucketed by
  * the join key removes it entirely: Spark's `FileSourceScanExec` exposes
  * the bucket spec as its output partitioning, so a join on the bucket
  * columns requires no Exchange on either side (verified by
  * `LayoutSpec`'s plan assertion). The trade is write-time cost and a
  * fixed bucket count — size buckets to ~128–256 MB at the target scale
  * and co-bucket tables that join together (same count, same keys).
  *
  * Bucketing requires the table catalog (`saveAsTable`) — plain
  * `.parquet(path)` writes no bucket metadata.
  */
object Layout {

  /** Write `df` as a bucketed (and per-bucket sorted) managed table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      buckets: Int,
      keys: Seq[String],
      sortKeys: Seq[String] = Nil): Unit = {
    val sorted = if (sortKeys.isEmpty) keys else sortKeys
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two co-bucketed tables on their bucket keys — planner emits a
    * sort-merge join with zero Exchanges when both tables share bucket
    * count and keys. */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String],
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}
