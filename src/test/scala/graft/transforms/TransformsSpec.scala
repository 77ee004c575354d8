package graft.transforms

import graft.SparkSpec
import graft.config.Codes
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Golden tests transcribed from the reference suite
  * (reference: test/test_spark_transforms.py). Each pins one load-bearing
  * semantic of SURVEY §2's inventory. */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  // ---- detailed-forecast fixture schema (FIXTURES.md §4) -----------------
  private val detailedCols = Seq(
    "latitude", "longitude", "control_dis", "control_time", "control_valid_time",
    "issued_on", "valid_for", "step",
    "p_above_2y", "p_above_5y", "p_above_20y",
    "min_dis", "Q1_dis", "median_dis", "Q3_dis", "max_dis")

  private def detailedDf(rows: Seq[(Double, Double, Double, String, String, String, String,
      Long, Double, Double, Double, Double, Double, Double, Double, Double)]): DataFrame = {
    val df = rows.toDF(detailedCols: _*)
    Seq("control_time", "control_valid_time", "issued_on", "valid_for")
      .foldLeft(df)((d, c) => d.withColumn(c, to_date(col(c), "yyyy-MM-dd")))
  }

  // ---- rounding / join keys (reference: test_spark_transforms.py:41-84) --
  test("round(col, 3) HALF_UP matches reference key normalization") {
    val got = Seq(19.0750000024, 17.324999994).toDF("value")
      .withColumn("rounded", round($"value", 3))
      .select("rounded").as[Double].collect().toSeq
    assert(got === Seq(19.075, 17.325))
  }

  test("unrounded double keys do not join; rounded keys do") {
    val df1 = Seq((19.0750000024, 17.324999994, 5)).toDF("lat", "lon", "val1")
    val df2 = Seq((19.0749999999, 17.325000006, 10)).toDF("lat", "lon", "val2")
    assert(df1.join(df2, Seq("lat", "lon"), "inner").count() === 0)

    def r(df: DataFrame) = df
      .withColumn("lat", round($"lat", 3)).withColumn("lon", round($"lon", 3))
    val joined = r(df1).join(r(df2), Seq("lat", "lon"), "inner").collect()
    assert(joined.length === 1)
    assert(joined.head === Row(19.075, 17.325, 5, 10))
  }

  // ---- tendency (reference: test_spark_transforms.py:87-139) -------------
  test("tendency classifies increasing / decreasing / stagnant / boundaries") {
    val df = detailedDf(Seq(
      // increasing: max median 15 > 10 * 1.10
      (0.0, 0.5, 10.0, "2023-10-01", "2023-10-02", "2023-10-02", "2023-10-02", 1L, 0.1, 0.2, 0.3, 9.0, 10.0, 11.0, 12.0, 13.0),
      (0.0, 0.5, 10.0, "2023-10-01", "2023-10-02", "2023-10-02", "2023-10-03", 2L, 0.1, 0.2, 0.3, 10.0, 11.0, 12.5, 13.0, 14.0),
      (0.0, 0.5, 10.0, "2023-10-01", "2023-10-02", "2023-10-02", "2023-10-04", 3L, 0.1, 0.2, 0.3, 10.5, 11.5, 15.0, 16.0, 17.0),
      // decreasing: min median 17.5 <= 20*0.90 and max median 18 <= 20*1.10
      (1.25, 1.0, 20.0, "2023-10-01", "2023-10-02", "2023-10-02", "2023-10-02", 1L, 0.1, 0.2, 0.3, 17.0, 18.0, 17.5, 20.0, 21.0),
      (1.25, 1.0, 20.0, "2023-10-01", "2023-10-02", "2023-10-02", "2023-10-03", 2L, 0.1, 0.2, 0.3, 16.0, 17.0, 17.8, 20.0, 21.5),
      (1.25, 1.0, 20.0, "2023-10-01", "2023-10-02", "2023-10-02", "2023-10-04", 3L, 0.1, 0.2, 0.3, 16.5, 17.5, 18.0, 20.5, 21.5),
      // stagnant
      (2.0, 2.6, 25.0, "2023-10-01", "2023-10-02", "2023-10-02", "2023-10-02", 1L, 0.1, 0.2, 0.3, 23.0, 24.0, 25.0, 26.0, 27.0),
      (2.0, 2.6, 25.0, "2023-10-01", "2023-10-02", "2023-10-02", "2023-10-03", 2L, 0.1, 0.2, 0.3, 24.0, 25.0, 26.0, 27.0, 28.0),
      (2.0, 2.6, 25.0, "2023-10-01", "2023-10-02", "2023-10-02", "2023-10-04", 3L, 0.1, 0.2, 0.3, 23.5, 24.5, 26.5, 27.5, 28.5),
      // boundary: max median exactly 1.10*control and min median just above 0.90*control → stagnant
      (3.0, 3.1, 30.0, "2023-10-01", "2023-10-02", "2023-10-02", "2023-10-02", 1L, 0.1, 0.2, 0.3, 29.0, 29.5, 33.0, 34.0, 35.0),
      (3.0, 3.1, 30.0, "2023-10-01", "2023-10-02", "2023-10-02", "2023-10-03", 2L, 0.1, 0.2, 0.3, 20.0, 21.5, 27.001, 28.0, 29.0)))

    val got = Tendency(df).select("latitude", "longitude", "tendency")
      .as[(Double, Double, String)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got((0.0, 0.5)) === Codes.Tendency.Increasing)
    assert(got((1.25, 1.0)) === Codes.Tendency.Decreasing)
    assert(got((2.0, 2.6)) === Codes.Tendency.Stagnant)
    assert(got((3.0, 3.1)) === Codes.Tendency.Stagnant)
  }

  // ---- intensity (reference: test_spark_transforms.py:141-192) -----------
  test("intensity classifies purple / red / yellow / gray by max probabilities") {
    def rowsFor(lat: Double, lon: Double, ps: Seq[(Double, Double, Double)]) =
      ps.zipWithIndex.map { case ((p2, p5, p20), i) =>
        (lat, lon, 10.0, "2023-10-01", "2023-10-02", "2023-10-02", "2023-10-02",
          (i + 1).toLong, p2, p5, p20, 9.0, 10.0, 11.0, 12.0, 13.0)
      }
    val df = detailedDf(
      rowsFor(0.0, 0.0, Seq((0.5, 0.4, 0.1), (0.6, 0.5, 0.31))) ++ // purple
        rowsFor(1.0, 0.0, Seq((0.5, 0.29, 0.1), (0.6, 0.31, 0.2))) ++ // red
        rowsFor(2.0, 0.0, Seq((0.29, 0.1, 0.0), (0.32, 0.2, 0.29))) ++ // yellow
        rowsFor(3.0, 0.0, Seq((0.29, 0.29, 0.29), (0.1, 0.0, 0.0)))) // gray

    val got = Intensity(df).select("latitude", "intensity")
      .as[(Double, String)].collect().toMap
    assert(got(0.0) === Codes.Intensity.Purple)
    assert(got(1.0) === Codes.Intensity.Red)
    assert(got(2.0) === Codes.Intensity.Yellow)
    assert(got(3.0) === Codes.Intensity.Gray)
  }

  // ---- peak timing (reference: test_spark_transforms.py:194-525) ---------
  test("peak timing: argmax by (severity, median) with the three timing classes") {
    // 30-step series per cell; valid_for = 2023-10-(step+1)
    def series(lat: Double, lon: Double)(f: Int => (Double, Double, Double, Double)) =
      (1 to 30).map { s =>
        val (p2, p5, p20, med) = f(s)
        (lat, lon, 10.0, "2023-10-01", "2023-10-02", "2023-10-02",
          f"2023-10-${s + 1}%02d", s.toLong, p2, p5, p20, med - 2, med - 1, med, med + 1, med + 2)
      }

    val df = detailedDf(
      // black border: condition-1 rows at steps 1,2; step 2 wins on higher median
      series(2.275, 2.0) { s =>
        if (s == 1) (0.5, 0.4, 0.33, 11.0)
        else if (s == 2) (0.5, 0.45, 0.31, 14.0)
        else (1.0, 0.29, 0.29, 19.0)
      } ++
        // grayed color: every step condition 4, peak at step 11 by max median,
        // max_2y_start over steps 1-10 < 0.30
        series(0.0, 0.975) { s =>
          if (s == 11) (0.29, 0.2, 0.1, 30.0) else (0.25, 0.2, 0.1, 11.0)
        } ++
        // gray border: condition-1 peak at step 7 (inside days 4..10)
        series(1.475, 1.025) { s =>
          if (s == 7) (0.9, 0.8, 0.5, 19.0) else (0.25, 0.2, 0.05, 11.0)
        } ++
        // grayed color with a mid-horizon condition-2 peak at step 26
        series(5.0, 0.975) { s =>
          if (s == 26) (0.9, 0.5, 0.1, 19.0) else (0.2, 0.1, 0.05, 11.0)
        })

    val got = PeakTiming(df)
      .select("latitude", "longitude", "peak_step", "peak_day", "peak_timing")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) ->
        ((r.getLong(2), r.getDate(3).toString, r.getString(4)))).toMap

    assert(got((2.275, 2.0)) === ((2L, "2023-10-03", Codes.PeakTiming.BlackBorder)))
    assert(got((0.0, 0.975)) === ((11L, "2023-10-12", Codes.PeakTiming.GrayedColor)))
    assert(got((1.475, 1.025)) === ((7L, "2023-10-08", Codes.PeakTiming.GrayBorder)))
    assert(got((5.0, 0.975)) === ((26L, "2023-10-27", Codes.PeakTiming.GrayedColor)))
  }

  // ---- threshold percentages (reference: test_spark_transforms.py:527-615)
  test("threshold percentages match reference golden values (approx and exact)") {
    def ensemble(lat: Double, lon: Double, issued: String, step: Long, validFor: String,
        vals: Seq[Double]) =
      vals.zipWithIndex.map { case (v, i) =>
        ((i + 1).toLong, lat, lon, issued, step, validFor, v)
      }

    val forecast = (
      ensemble(0.5, 0.5, "2023-10-01 00:00:00", 1, "2023-10-01 00:00:00",
        Seq(100.0, 50.0, 25.0, 75.0, 15.0, 105.0, 35.0, 65.0, 90.0, 120.0)) ++
        ensemble(2.5, 0.5, "2023-10-05 00:00:00", 17, "2023-10-21 00:00:00",
          Seq(11.0, 9.0, 22.0, 22.0, 14.0, 15.0, 13.0, 7.0, 8.0, 5.0)) ++
        ensemble(5.5, 1.5, "2023-10-01 00:00:00", 9, "2023-10-09 00:00:00",
          Seq(11.0, 9.0, 22.0, 22.0, 14.0, 15.0, 13.0, 7.0, 8.0, 5.0, 6.0))
    ).toDF("number", "latitude", "longitude", "issued_on", "step", "valid_for", "dis24")

    val thresholds = Seq(
      (0.5, 0.5, 20.0, 50.0, 120.0),
      (2.5, 0.5, 9.0, 11.0, 15.0),
      (5.5, 1.5, 10.0, 13.0, 16.0)
    ).toDF("latitude", "longitude", "threshold_2y", "threshold_5y", "threshold_20y")

    val expectedApprox = Seq(
      (0.5, 0.5, "2023-10-01 00:00:00", "2023-10-01 00:00:00", 1L, 0.9, 0.7, 0.1, 15.0, 35.0, 65.0, 100.0, 120.0),
      (2.5, 0.5, "2023-10-05 00:00:00", "2023-10-21 00:00:00", 17L, 0.7, 0.6, 0.3, 5.0, 8.0, 11.0, 15.0, 22.0),
      (5.5, 1.5, "2023-10-01 00:00:00", "2023-10-09 00:00:00", 9L, 6.0 / 11, 5.0 / 11, 2.0 / 11, 5.0, 7.0, 11.0, 15.0, 22.0))
    val expectedExact = Seq(
      (0.5, 0.5, "2023-10-01 00:00:00", "2023-10-01 00:00:00", 1L, 0.9, 0.7, 0.1, 15.0, 38.75, 70.0, 97.5, 120.0),
      (2.5, 0.5, "2023-10-05 00:00:00", "2023-10-21 00:00:00", 17L, 0.7, 0.6, 0.3, 5.0, 8.25, 12.0, 14.75, 22.0),
      (5.5, 1.5, "2023-10-01 00:00:00", "2023-10-09 00:00:00", 9L, 6.0 / 11, 5.0 / 11, 2.0 / 11, 5.0, 7.5, 11.0, 14.5, 22.0))

    def check(mode: ThresholdPercentages.AccuracyMode,
        expected: Seq[(Double, Double, String, String, Long, Double, Double, Double,
          Double, Double, Double, Double, Double)]): Unit = {
      val got = ThresholdPercentages(forecast, thresholds, Seq(2, 5, 20), mode)
        .sort("latitude", "longitude").collect()
      got.zip(expected).foreach { case (row, exp) =>
        assert(row.getDouble(0) === exp._1)
        assert(row.getDouble(1) === exp._2)
        assert(row.getString(2) === exp._3)
        assert(row.getString(3) === exp._4)
        assert(row.getLong(4) === exp._5)
        val nums = (5 to 12).map(row.getDouble)
        val expNums = Seq(exp._6, exp._7, exp._8, exp._9, exp._10, exp._11, exp._12, exp._13)
        nums.zip(expNums).foreach { case (g, e) => assert(math.abs(g - e) < 1e-9, s"$row vs $exp") }
      }
    }
    check(ThresholdPercentages.Approx, expectedApprox)
    check(ThresholdPercentages.Exact, expectedExact)
  }

  // ---- geometry (reference: test_spark_transforms.py:617-645) ------------
  test("WKT polygons match reference golden strings") {
    val df = Seq(
      (16.975, -17.975, 20.0, 21.0, 22.0),
      (2.225, 2.475, 30.0, 32.0, 39.0),
      (-0.525, 3.925, 35.0, 39.0, 44.0)
    ).toDF("latitude", "longitude", "threshold_2y", "threshold_5y", "threshold_20y")

    val got = Geometry.addWkt(df, halfGridSize = 0.025, precision = 3)
      .select("latitude", "wkt").as[(Double, String)].collect().toMap
    assert(got(16.975) === "POLYGON ((-18.0 16.95,-18.0 17.0,-17.95 17.0,-17.95 16.95,-18.0 16.95))")
    assert(got(2.225) === "POLYGON ((2.45 2.2,2.45 2.25,2.5 2.25,2.5 2.2,2.45 2.2))")
    assert(got(-0.525) === "POLYGON ((3.9 -0.55,3.9 -0.5,3.95 -0.5,3.95 -0.55,3.9 -0.55))")
  }

  test("zOrder is a bijection: deinterleaving recovers both cell indices") {
    val cells = (for (la <- 0L until 64L; lo <- 0L until 64L) yield (la, lo)).toDF("la", "lo")
    def deinterleave(z: org.apache.spark.sql.Column, odd: Int): org.apache.spark.sql.Column =
      (0 until 16).map(k => shiftright(z, 2 * k + odd).bitwiseAND(lit(1L)) * (1L << k)).reduce(_ + _)
    val z = Geometry.zOrder(col("la"), col("lo"))
    val bad = cells.select(
      (deinterleave(z, 1) === col("la") && deinterleave(z, 0) === col("lo")).as("ok"))
      .filter(not(col("ok"))).count()
    assert(bad == 0)
    // distinctness over the grid (bijective on the domain)
    assert(cells.select(z.as("z")).distinct().count() == 64 * 64)
  }
}
