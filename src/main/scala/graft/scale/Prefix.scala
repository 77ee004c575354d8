package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sums.
  *
  * The naive Spark form — `sum(x) over (order by k)` with no PARTITION BY
  * — moves the ENTIRE table into one partition (WindowExec requires all
  * peer rows co-located), the classic global-window scale trap. The
  * two-phase form here keeps the sort range-parallel:
  *
  *  1. range-partition by the order key and cumsum WITHIN partitions
  *     (each partition sorts its own slice);
  *  2. per-partition totals (one row per partition) prefix-sum on the
  *     driver-sized side and broadcast back as each partition's base.
  *
  * The totals table is `numPartitions` rows, so the only non-parallel
  * window runs over P rows, and the output values are independent of
  * where the range boundaries land.
  */
object Prefix {

  /** `outCol` = sum of `valueCol` over all rows STRICTLY BEFORE this row
    * in `orderCol` order (exclusive running total; first row gets 0).
    * `orderCol` must be unique — ties across a partition boundary would
    * make "before" ambiguous. */
  def exclusiveRunningTotal(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      outCol: String,
      numPartitions: Int = 0): DataFrame = {
    val ranged =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, col(orderCol))
      else df.repartitionByRange(col(orderCol))
    val withPid = ranged.withColumn("__pid", spark_partition_id())
    val wIn = Window.partitionBy("__pid").orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val inPart = withPid.withColumn("__local",
      coalesce(sum(col(valueCol)).over(wIn), lit(0L)))
    // partition totals FROM the cumsum output (the last ordered row's
    // inclusive sum) — both plan branches then share one RangeExchange,
    // which AQE reuses instead of re-shuffling the source
    val wP = Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = inPart
      .groupBy("__pid")
      .agg(max_by(col("__local") + col(valueCol), col(orderCol)).as("__ptotal"))
      .withColumn("__prefix", coalesce(sum(col("__ptotal")).over(wP), lit(0L)))
      .select("__pid", "__prefix")
    inPart.join(broadcast(prefixes), Seq("__pid"))
      .withColumn(outCol, col("__local") + col("__prefix"))
      .drop("__pid", "__local", "__prefix")
  }
}
