package graft.transforms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Detailed forecast: ensemble → per-(cell, step) exceedance probabilities
  * plus a five-number discharge summary.
  *
  * Semantics (reference: flood/spark/transforms.py:112-150):
  *  - left-join forecasts to per-cell thresholds on (latitude, longitude);
  *  - per return period N: indicator `exceed_Ny = dis24 >= threshold_Ny`;
  *  - group by (latitude, longitude, issued_on, valid_for, step):
  *    mean(indicator) → `p_above_Ny`; min/Q1/median/Q3/max of dis24.
  *
  * Quantiles come in two modes (reference: transforms.py:132-137):
  * `Approx` = `percentile_approx` at default accuracy (the production
  * default — mergeable sketch, single shuffle, scales to 100 TB), `Exact` =
  * interpolating `percentile` (collects per-group value buffers; use for
  * oracle parity and small groups only).
  *
  * Scale notes: one hash aggregation after an equi-join on the rounded grid
  * keys. The threshold side is a per-cell dimension table (~1 row per grid
  * cell) — broadcast it when small; at 100 TB of forecasts the join and the
  * aggregation share the (latitude, longitude)-hash partitioning so the agg
  * reuses the join's shuffle.
  */
object ThresholdPercentages {

  sealed trait AccuracyMode
  case object Approx extends AccuracyMode
  case object Exact extends AccuracyMode

  /** Exact quantiles from ONE aggregation buffer
    * ([[graft.functions.FiveNumberSummary]]) instead of three independent
    * `percentile` buffers + min + max — same values (type-7
    * interpolation), a fifth of the aggregation state. */
  case object ExactOnePass extends AccuracyMode

  /** `extraGroupCols`: RAW attributes appended to the grouping key and
    * dropped from the output — functionally redundant columns (each must
    * be constant within a group, e.g. `step_hours` alongside the derived
    * `step`) that let a scan-reported clustering satisfy the aggregation's
    * distribution, planning it with NO exchange (see
    * [[graft.sources.GribSource]] `partitionByStep`). */
  def apply(
      forecast: DataFrame,
      thresholds: DataFrame,
      thresholdYears: Seq[Int] = Seq(2, 5, 20),
      mode: AccuracyMode = Approx,
      extraGroupCols: Seq[String] = Nil
  ): DataFrame = {
    // left join on the packed CellKey; the fact side keeps its (lat, lon)
    // columns, so the output is column-identical to the two-key form
    val joined = CellKey.join(forecast, thresholds, "left")

    val withIndicators = thresholdYears.foldLeft(joined) { (df, n) =>
      df.withColumn(
        s"exceed_${n}y",
        when(col("dis24") >= col(s"threshold_${n}y"), 1).otherwise(0))
    }

    def quantile(q: Double): Column = mode match {
      case Approx => percentile_approx(col("dis24"), lit(q), lit(10000))
      case Exact | ExactOnePass => expr(s"percentile(dis24, $q)")
    }

    val pAboves = thresholdYears.map(n => mean(col(s"exceed_${n}y")).as(s"p_above_${n}y"))
    val groupCols =
      Seq("latitude", "longitude", "issued_on", "valid_for", "step") ++ extraGroupCols
    val grouped = withIndicators.groupBy(groupCols.map(col): _*)

    val aggregated = mode match {
      case ExactOnePass =>
        val aggs = pAboves :+ graft.functions.FiveNumberSummary(col("dis24")).as("fns")
        grouped.agg(aggs.head, aggs.tail: _*)
          .withColumn("min_dis", col("fns.min"))
          .withColumn("Q1_dis", col("fns.q1"))
          .withColumn("median_dis", col("fns.median"))
          .withColumn("Q3_dis", col("fns.q3"))
          .withColumn("max_dis", col("fns.max"))
          .drop("fns")
      case _ =>
        val aggs = pAboves ++ Seq(
          min(col("dis24")).as("min_dis"),
          quantile(0.25).as("Q1_dis"),
          quantile(0.5).as("median_dis"),
          quantile(0.75).as("Q3_dis"),
          max(col("dis24")).as("max_dis"))
        grouped.agg(aggs.head, aggs.tail: _*)
    }
    if (extraGroupCols.isEmpty) aggregated else aggregated.drop(extraGroupCols: _*)
  }
}
