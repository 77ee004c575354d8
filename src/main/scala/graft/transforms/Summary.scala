package graft.transforms

import graft.config.Codes
import org.apache.spark.sql.{Column, DataFrame}
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
  /** The classification CASE over the per-cell aggregates — shared with
    * the fused [[Summary.onePass]] stage so the two paths cannot drift. */
  private[transforms] def classify(
      maxMedian: Column, minMedian: Column, control: Column): Column =
    when(maxMedian > control * 1.10, Codes.Tendency.Increasing)
      .when(
        minMedian <= control * 0.90 && maxMedian <= control * 1.10,
        Codes.Tendency.Decreasing)
      .otherwise(Codes.Tendency.Stagnant)

  def apply(detailedWithControl: DataFrame, colName: String = "tendency"): DataFrame = {
    val agg = detailedWithControl
      .groupBy("latitude", "longitude")
      .agg(
        max("median_dis").as("max_median_dis"),
        min("median_dis").as("min_median_dis"),
        min("control_dis").as("control_dis"),
        max("max_dis").as("max_max_dis"),
        min("min_dis").as("min_min_dis"))

    agg.withColumn(
      colName,
      classify(col("max_median_dis"), col("min_median_dis"), col("control_dis")))
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
  /** Shared with [[Summary.onePass]]. */
  private[transforms] def classify(p20: Column, p5: Column, p2: Column): Column =
    when(p20 >= 0.30, Codes.Intensity.Purple)
      .when(p5 >= 0.30, Codes.Intensity.Red)
      .when(p2 >= 0.30, Codes.Intensity.Yellow)
      .otherwise(Codes.Intensity.Gray)

  def apply(detailed: DataFrame, colName: String = "intensity"): DataFrame = {
    val agg = detailed
      .groupBy("latitude", "longitude")
      .agg(
        max("p_above_20y").as("max_p_above_20y"),
        max("p_above_5y").as("max_p_above_5y"),
        max("p_above_2y").as("max_p_above_2y"))

    agg.withColumn(
      colName,
      classify(col("max_p_above_20y"), col("max_p_above_5y"), col("max_p_above_2y")))
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
  /** Severity rank of one detailed row (1 = worst). Shared with
    * [[Summary.onePass]]. */
  private[transforms] def condition: Column =
    when(col("p_above_20y") >= 0.3, 1)
      .when(col("p_above_5y") >= 0.3, 2)
      .when(col("p_above_2y") >= 0.3, 3)
      .otherwise(4)

  /** First-10-day 2-year exceedance signal — the windowed/grouped max the
    * grayed_color rule reads. Shared with [[Summary.onePass]]. */
  private[transforms] def max2yStartAgg: Column =
    max(when(col("step").between(1, 10), col("p_above_2y")))

  /** The timing CASE over the peak row. A null `max2yStart` (no rows in
    * steps 1–10) compares null < 0.30 → null → falls through to
    * gray_border, identical in both the windowed and the fused paths. */
  private[transforms] def timing(peakStep: Column, max2yStart: Column): Column =
    when(peakStep.between(1, 3), Codes.PeakTiming.BlackBorder)
      .when(peakStep > 10 && max2yStart < 0.30, Codes.PeakTiming.GrayedColor)
      .otherwise(Codes.PeakTiming.GrayBorder)

  def apply(detailed: DataFrame, colName: String = "peak_timing"): DataFrame = {
    val cellW = Window.partitionBy("latitude", "longitude")

    val withSignals = detailed
      .withColumn("max_2y_start", max2yStartAgg.over(cellW))
      .withColumn("condition", condition)

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

    peak
      .withColumn(colName, timing(col("peak_step"), col("max_2y_start")))
      .drop("max_2y_start")
  }
}

/** The WHOLE summary stage — tendency, intensity, and peak timing — in a
  * single aggregation pass over the detailed forecast.
  *
  * [[Tendency]]/[[Intensity]]/[[PeakTiming]] are the stage's operators in
  * isolation (each individually oracle-checked); composed the obvious way
  * (`peak ⨝ tendency ⨝ intensity`, the reference's own shape,
  * flood/spark/transforms.py:4-109) they shuffle the detailed frame three
  * times on the same (latitude, longitude) key and then join the three
  * per-cell results back together. At the operational 19.3 M-row detailed
  * frame — never mind 100× that — two of those exchanges and both joins
  * are pure waste: every branch partitions identically.
  *
  * This fusion computes all three classifications from ONE
  * `groupBy(latitude, longitude)`:
  *  - tendency/intensity inputs are plain min/max aggregates;
  *  - the peak row is an argmax — [[graft.functions.ArgMaxRow]] over
  *    (-condition, median_dis, -step, payload) realizes the windowed
  *    ordering (condition asc, median_dis desc, step asc) as a
  *    lexicographic ordering: negating the int keys flips their direction
  *    exactly, `median_dis` stays positive so its NaN-greatest comparison
  *    matches the window sort's NaN-first placement under `desc`, and the
  *    payload fields are a final deterministic tiebreak (unreachable when
  *    `step` is unique per cell, the daily-forecast invariant). ArgMaxRow
  *    compares exactly like `max(struct(...))` but keeps the aggregation
  *    buffer scalar, so the stage hash-aggregates instead of falling back
  *    to a SortAggregate (pinned by SummaryCodegenAuditSpec);
  *  - `max_2y_start` is the same conditional max the windowed form
  *    computes per cell.
  *
  * Output schema (names, order, types) is bit-identical to the three-way
  * inner join of the standalone operators — pinned by SummarySpec — so
  * the two forms are interchangeable in every oracle query.
  *
  * One exchange for the whole stage; with a scan-reported clustering that
  * already covers the grouping (not the case for (lat, lon) — GRIB
  * clusters by step) it would be zero. The join-free shape also removes
  * the three-way sort-merge at the end: per cell the stage is now one
  * hash-agg row update, the cheapest form that computes these semantics.
  */
object Summary {

  /** `detailedWithControl`: the detailed forecast with `control_dis`
    * joined on (the same frame [[Tendency]] takes — [[Intensity]] and
    * [[PeakTiming]] ignore the extra column). */
  def onePass(detailedWithControl: DataFrame): DataFrame = {
    // Ordering (condition asc, median_dis desc, step asc, payload
    // tiebreak) realized as a lexicographic max over negated keys — the
    // same tuple the windowed PeakTiming sorts by. ArgMaxRow flattens the
    // aggregation buffer to scalars so the whole stage hash-aggregates
    // (max(struct(...)) would force a SortAggregate — both sides of the
    // stage's exchange sorting the full fact input; see ArgMaxRow docs and
    // SummaryCodegenAuditSpec).
    val peakArgmax = graft.functions.ArgMaxRow(
      Seq(
        -PeakTiming.condition,
        col("median_dis"),
        -col("step"),
        col("issued_on"),
        col("step"),
        col("valid_for")),
      Seq("issued_on" -> 3, "step" -> 4, "valid_for" -> 5))

    val agg = detailedWithControl
      .groupBy("latitude", "longitude")
      .agg(
        peakArgmax.as("pk"),
        PeakTiming.max2yStartAgg.as("max_2y_start"),
        max("median_dis").as("max_median_dis"),
        min("median_dis").as("min_median_dis"),
        min("control_dis").as("control_dis"),
        max("max_dis").as("max_max_dis"),
        min("min_dis").as("min_min_dis"),
        max("p_above_20y").as("max_p_above_20y"),
        max("p_above_5y").as("max_p_above_5y"),
        max("p_above_2y").as("max_p_above_2y"))

    // Exact column order of PeakTiming ⨝ Tendency ⨝ Intensity on
    // (latitude, longitude): key cols, then each operator's payload.
    agg.select(
      col("latitude"),
      col("longitude"),
      col("pk.issued_on").as("issued_on"),
      col("pk.step").as("peak_step"),
      col("pk.valid_for").as("peak_day"),
      PeakTiming.timing(col("pk.step"), col("max_2y_start")).as("peak_timing"),
      col("max_median_dis"),
      col("min_median_dis"),
      col("control_dis"),
      col("max_max_dis"),
      col("min_min_dis"),
      Tendency.classify(
        col("max_median_dis"), col("min_median_dis"), col("control_dis")).as("tendency"),
      col("max_p_above_20y"),
      col("max_p_above_5y"),
      col("max_p_above_2y"),
      Intensity.classify(
        col("max_p_above_20y"), col("max_p_above_5y"), col("max_p_above_2y")).as("intensity"))
  }
}
