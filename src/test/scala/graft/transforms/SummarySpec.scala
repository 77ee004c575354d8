package graft.transforms

import graft.SparkSpec
import graft.queries.FloodShaped
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Pins the round-12 fused summary stage ([[Summary.onePass]]) to the
  * composition it replaced: the three standalone operators joined on
  * (latitude, longitude). The fusion is only allowed to change the PLAN
  * (one exchange, no joins), never a value — bit-identity here is what
  * lets q_summary_forecast / q_pipeline_e2e keep their DuckDB oracle
  * hashes while the pipeline default switched over. */
class SummarySpec extends SparkSpec {
  import spark.implicits._

  /** Realistic detailed frame (sf0.001 flood-shaped tables, exact
    * quantiles) with the step-1-median control joined on — the exact
    * frame the pipeline hands the summary stage. */
  private lazy val detailedWithControl: DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val d = ThresholdPercentages(
      FloodShaped.forecast(spark, dir),
      FloodShaped.thresholds(spark, dir),
      Seq(2, 5, 20),
      ThresholdPercentages.ExactOnePass)
    val control = d.filter(col("step") === 1)
      .select(col("latitude"), col("longitude"), col("median_dis").as("control_dis"))
    d.join(control, Seq("latitude", "longitude"), "left").cache()
  }

  test("onePass is bit-identical to PeakTiming ⨝ Tendency ⨝ Intensity") {
    val joined = PeakTiming(detailedWithControl)
      .join(Tendency(detailedWithControl), Seq("latitude", "longitude"), "inner")
      .join(Intensity(detailedWithControl), Seq("latitude", "longitude"), "inner")
    val fused = Summary.onePass(detailedWithControl)

    assert(fused.schema === joined.schema) // names, ORDER, types, nullability-compatible

    def byCell(df: DataFrame): Map[(Double, Double), Row] =
      df.collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r).toMap
    val want = byCell(joined)
    val got = byCell(fused)
    assert(got.keySet === want.keySet)
    got.foreach { case (cell, row) => assert(row === want(cell), s"cell $cell") }
    assert(got.nonEmpty)
  }

  test("onePass is ONE exchange over its input — no joins, no extra shuffles") {
    detailedWithControl.count() // materialize the cache so the input is a scan
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case s: QueryStageExec => flatten(s.plan)
      case other => other.children.flatMap(flatten)
    })
    val df = Summary.onePass(detailedWithControl)
    df.count() // finalize the adaptive plan
    val nodes = flatten(df.queryExecution.executedPlan)
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike])
    assert(shuffles === 1, s"expected exactly one exchange, plan:\n${df.queryExecution.executedPlan}")
    assert(!nodes.exists(_.nodeName.toLowerCase.contains("join")),
      "the fused stage must not join")
  }

  test("onePass peak argmax realizes (condition asc, median_dis desc, step asc)") {
    // Hand-built ties that exercise each key of the composite ordering:
    //   cell (0,0): condition dominates (step 2 is severity-1 despite a
    //     lower median);
    //   cell (1,1): equal condition → higher median wins;
    //   cell (2,2): equal condition AND median → LOWER step wins.
    def row(lat: Double, step: Int, p2: Double, p5: Double, p20: Double, median: Double) =
      (lat, lat, "2023-10-01", s"2023-10-0${step + 1}", step,
        p2, p5, p20, median - 1, median - 0.5, median, median + 0.5, median + 1, 10.0)
    val cols = Seq("latitude", "longitude", "issued_on", "valid_for", "step",
      "p_above_2y", "p_above_5y", "p_above_20y",
      "min_dis", "Q1_dis", "median_dis", "Q3_dis", "max_dis", "control_dis")
    val df = Seq(
      row(0.0, 1, 0.9, 0.0, 0.0, 99.0), // condition 3
      row(0.0, 2, 0.9, 0.9, 0.9, 5.0), //  condition 1 ← peak
      row(1.0, 1, 0.9, 0.0, 0.0, 7.0), //  condition 3
      row(1.0, 2, 0.9, 0.0, 0.0, 9.0), //  condition 3, higher median ← peak
      row(2.0, 4, 0.9, 0.0, 0.0, 6.0), //  tie with step 3 on everything
      row(2.0, 3, 0.9, 0.0, 0.0, 6.0) //   ← peak (lower step)
    ).toDF(cols: _*)
      .withColumn("issued_on", to_date(col("issued_on")))
      .withColumn("valid_for", to_date(col("valid_for")))

    val fromWindow = PeakTiming(df).select("latitude", "peak_step")
      .as[(Double, Int)].collect().toMap
    val fromFused = Summary.onePass(df)
      .select("latitude", "peak_step").as[(Double, Int)].collect().toMap
    assert(fromFused === Map(0.0 -> 2, 1.0 -> 2, 2.0 -> 3))
    assert(fromFused === fromWindow) // the two forms must agree row for row
  }
}
