package graft.pipeline

import graft.SparkSpec
import graft.config.FloodConfig
import graft.transforms.{Normalize, ThresholdPercentages}
import org.apache.spark.sql.functions._

/** End-to-end pipeline smoke over synthetic raw rows: normalization
  * (epoch-ns → dates), detailed + summary outputs, geometry, relevance
  * filtering (reference: databricks/glofas-forecast-computation.py:124-280). */
class ForecastPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dayNs = 24L * 3600 * 1000 * 1000 * 1000

  test("normalize derives issued_on, step days, valid_for from epoch-ns") {
    val t0 = 1696118400L * 1000000000L // 2023-10-01 00:00:00 UTC in ns
    val raw = Seq(
      (1L, 0.52500000001, 0.475, t0, 1 * dayNs, t0 + 1 * dayNs, 10.0f)
    ).toDF("number", "latitude", "longitude", "time", "step", "valid_time", "dis24")

    val got = Normalize.forecast(raw, precision = 3).collect().head
    assert(got.getAs[Double]("latitude") === 0.525)
    assert(got.getAs[Int]("step") === 1)
    assert(got.getAs[java.sql.Date]("issued_on").toString === "2023-10-01")
    // valid_time 2023-10-02 minus one day → the 24h window it covers
    assert(got.getAs[java.sql.Date]("valid_for").toString === "2023-10-01")
  }

  test("pipeline produces detailed + summary with geometry and relevance filter") {
    val t0 = 1696118400L * 1000000000L
    // two cells x 12 steps x 5 members; cell A floods (exceeds 2y+5y), cell B dry
    val raw = (for {
      (lat, base) <- Seq((0.525, 100.0), (1.025, 10.0))
      step <- 1 to 12
      member <- 1 to 5
    } yield {
      val dis = (base + step + member).toFloat
      (member.toLong, lat, 0.475, t0, step * dayNs, t0 + step * dayNs, dis)
    }).toDF("number", "latitude", "longitude", "time", "step", "valid_time", "dis24")

    val thresholds = Seq(
      (0.525, 0.475, 50.0, 80.0, 200.0), // cell A: always above 2y and 5y
      (1.025, 0.475, 50.0, 80.0, 200.0) // cell B: never above
    ).toDF("latitude", "longitude", "threshold_2y", "threshold_5y", "threshold_20y")

    val out = ForecastPipeline.run(
      Normalize.forecast(raw, 3), thresholds, FloodConfig(),
      mode = ThresholdPercentages.Exact)

    val summary = out.summary.collect()
    assert(summary.length === 1) // dry cell filtered out (intensity G)
    val s = summary.head
    assert(s.getAs[Double]("latitude") === 0.525)
    assert(s.getAs[String]("intensity") === "R") // p5y = 1.0 >= .3, p20y = 0
    // step-12 median 115 > 1.10 * control median 104 → increasing
    assert(s.getAs[String]("tendency") === "U")
    assert(Set("BB", "GB", "GC").contains(s.getAs[String]("peak_timing")))
    assert(s.getAs[String]("wkt").startsWith("POLYGON (("))

    val detailed = out.detailed
    assert(detailed.select("latitude").distinct().count() === 1) // semi-join to summary cells
    assert(detailed.count() === 12) // one row per step
    assert(detailed.columns.contains("wkt"))

    // p_above_2y exact: all 5 members exceed for cell A at every step
    val p2 = detailed.select(min("p_above_2y"), max("p_above_2y")).as[(Double, Double)].first()
    assert(p2 === ((1.0, 1.0)))
  }
}
