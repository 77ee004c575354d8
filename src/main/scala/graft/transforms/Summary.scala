package graft.transforms

import graft.config.Codes
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-cell tendency classification: is the forecast median discharge
  * rising or falling relative to the control run?
  *
  * Semantics (reference: flood/spark/transforms.py:4-29): group the
  * detailed forecast by cell; increasing iff max(median) > 1.10×control,
  * decreasing iff min(median) <= 0.90×control AND max(median) <=
  * 1.10×control, else stagnant. `first(control_dis)` is sound because
  * control_dis is constant within a cell after the control join — we use
  * `min` for full determinism with identical semantics (SURVEY §7.4.4).
  */
object Tendency {
  def apply(detailedWithControl: DataFrame, colName: String = "tendency"): DataFrame = {
    val agg = detailedWithControl
      .groupBy("latitude", "longitude")
      .agg(
        max("median_dis").as("max_median_dis"),
        min("median_dis").as("min_median_dis"),
        min("control_dis").as("control_dis"),
        max("max_dis").as("max_max_dis"),
        min("min_dis").as("min_min_dis"))

    val tendency =
      when(col("max_median_dis") > col("control_dis") * 1.10, Codes.Tendency.Increasing)
        .when(
          col("min_median_dis") <= col("control_dis") * 0.90 &&
            col("max_median_dis") <= col("control_dis") * 1.10,
          Codes.Tendency.Decreasing)
        .otherwise(Codes.Tendency.Stagnant)

    agg.withColumn(colName, tendency)
  }
}

/** Per-cell intensity (map color): worst exceedance probability observed
  * over the horizon.
  *
  * Semantics (reference: flood/spark/transforms.py:31-56): purple iff
  * max p_above_20y >= 0.30; else red iff max p_above_5y >= 0.30; else
  * yellow iff max p_above_2y >= 0.30; else gray.
  */
object Intensity {
  def apply(detailed: DataFrame, colName: String = "intensity"): DataFrame = {
    val agg = detailed
      .groupBy("latitude", "longitude")
      .agg(
        max("p_above_20y").as("max_p_above_20y"),
        max("p_above_5y").as("max_p_above_5y"),
        max("p_above_2y").as("max_p_above_2y"))

    val intensity =
      when(col("max_p_above_20y") >= 0.30, Codes.Intensity.Purple)
        .when(col("max_p_above_5y") >= 0.30, Codes.Intensity.Red)
        .when(col("max_p_above_2y") >= 0.30, Codes.Intensity.Yellow)
        .otherwise(Codes.Intensity.Gray)

    agg.withColumn(colName, intensity)
  }
}

/** Per-cell peak timing: when does the worst of the flood arrive?
  *
  * Semantics (reference: flood/spark/transforms.py:58-109):
  *  1. `max_2y_start` = max p_above_2y over steps 1–10 per cell;
  *  2. severity rank `condition` = 1 (p20y>=.3) / 2 (p5y>=.3) / 3 (p2y>=.3)
  *     / 4 per row;
  *  3. peak row = argmin by (condition asc, median_dis desc) via
  *     `row_number` — deliberately NOT `first()` over a sorted window,
  *     which the reference documents as unreliable (transforms.py:92-95);
  *  4. timing: steps 1–3 → black_border; peak after day 10 with a weak
  *     first-10-day signal (< 0.30) → grayed_color; else gray_border.
  *
  * The windowed max in step 1 is computed with a window function over the
  * same (latitude, longitude) partitioning instead of the reference's
  * agg-then-self-join (transforms.py:61-71) — one shuffle instead of two,
  * identical results (left join back onto the same keys).
  */
object PeakTiming {
  def apply(detailed: DataFrame, colName: String = "peak_timing"): DataFrame = {
    val cellW = Window.partitionBy("latitude", "longitude")

    val withSignals = detailed
      .withColumn(
        "max_2y_start",
        max(when(col("step").between(1, 10), col("p_above_2y"))).over(cellW))
      .withColumn(
        "condition",
        when(col("p_above_20y") >= 0.3, 1)
          .when(col("p_above_5y") >= 0.3, 2)
          .when(col("p_above_2y") >= 0.3, 3)
          .otherwise(4))

    // Final `step` tiebreak beyond the reference's composite key: the
    // reference's ordering is partition-order-dependent when two steps tie
    // on (condition, median_dis) (transforms.py:86-90); pinning by step
    // makes the plan deterministic across engines/runs without changing
    // any untied result.
    val rankW = cellW.orderBy(asc("condition"), desc("median_dis"), asc("step"))

    val peak = withSignals
      .withColumn("row_num", row_number().over(rankW))
      .filter(col("row_num") === 1)
      .select("latitude", "longitude", "max_2y_start", "issued_on", "step", "valid_for")
      .withColumnRenamed("step", "peak_step")
      .withColumnRenamed("valid_for", "peak_day")

    val timing =
      when(col("peak_step").between(1, 3), Codes.PeakTiming.BlackBorder)
        .when(col("peak_step") > 10 && col("max_2y_start") < 0.30, Codes.PeakTiming.GrayedColor)
        .otherwise(Codes.PeakTiming.GrayBorder)

    peak.withColumn(colName, timing).drop("max_2y_start")
  }
}
