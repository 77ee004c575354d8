package graft.pipeline

import graft.SparkSpec
import graft.config.FloodConfig
import java.nio.file.Files

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("jdbcWriter composes the configured writer without a live database") {
    val df = Seq((1L, "a")).toDF("id", "v")
    val w = Sinks.jdbcWriter(df, Sinks.JdbcConfig(
      url = "jdbc:postgresql://db/flood", table = "summary", user = "u", password = "p"))
    assert(w != null) // building must not touch the DB; .save() is the action
  }

  test("readControl extracts the step-1 control discharge from a control parquet") {
    val dir = Files.createTempDirectory("control").toString
    val cfg = FloodConfig()
    val dayNs = 24L * 3600 * 1000 * 1000 * 1000
    val t0 = 1696118400L * 1000000000L
    Seq(
      (0L, -5.9751, 28.0249, t0, 1 * dayNs, t0 + 1 * dayNs, 7.5f),
      (0L, -5.9751, 28.0249, t0, 2 * dayNs, t0 + 2 * dayNs, 9.0f)) // step 2 dropped
      .toDF("number", "latitude", "longitude", "time", "step", "valid_time", "dis24")
      .write.mode("overwrite").parquet(dir)
    val got = ForecastPipeline.readControl(spark, dir, cfg)
      .as[(Double, Double, Double)].collect().toSeq
    assert(got == Seq((-5.975, 28.025, 7.5))) // keys rounded, step-1 only
  }
}
