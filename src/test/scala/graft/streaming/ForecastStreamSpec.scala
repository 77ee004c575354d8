package graft.streaming

import graft.SparkSpec
import graft.config.FloodConfig
import graft.transforms.Normalize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Stream–static join equivalence: the streaming exceedance path must
  * agree row-for-row with the batch normalize+join+indicator semantics. */
class ForecastStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dayNs = 24L * 3600 * 1000 * 1000 * 1000
  private val t0Ns = 1696118400L * 1000000000L // 2023-10-01 UTC

  /** Small raw forecast in the epoch-ns physical schema, with jittered
    * keys (exercises rounding) and a null discharge row (exercises the
    * NA-drop). */
  private lazy val raw = Seq(
    (1L, 10.0251, 20.0249, t0Ns, 1 * dayNs, t0Ns + 1 * dayNs, Some(5.0f)),
    (2L, 10.025, 20.025, t0Ns, 1 * dayNs, t0Ns + 1 * dayNs, Some(50.0f)),
    (3L, 10.025, 20.025, t0Ns, 2 * dayNs, t0Ns + 2 * dayNs, Some(500.0f)),
    (4L, 10.025, 20.025, t0Ns, 2 * dayNs, t0Ns + 2 * dayNs, None),
    (5L, -3.975, 20.025, t0Ns, 1 * dayNs, t0Ns + 1 * dayNs, Some(7.5f)))
    .toDF("number", "latitude", "longitude", "time", "step", "valid_time", "dis24")
    .withColumn("dis24", col("dis24").cast("float"))

  private lazy val thresholds = Seq(
    (10.025, 20.025, 10.0, 100.0, 400.0),
    (-3.975, 20.025, 5.0, 50.0, 200.0))
    .toDF("latitude", "longitude", "threshold_2y", "threshold_5y", "threshold_20y")

  test("streaming exceedances == batch normalize+join+indicators") {
    val dir = Files.createTempDirectory("forecast-stream")
    raw.write.mode("overwrite").parquet(dir.toString)
    val checkpoint = Files.createTempDirectory("ckpt").toString
    val q = ForecastStream.exceedances(
      ForecastStream.readForecast(spark, dir.toString), thresholds)
      .writeStream
      .format("memory").queryName("exc").outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("number", "latitude", "longitude", "step", "dis24",
        "exceed_2y", "exceed_5y", "exceed_20y")
      .as[(Long, Double, Double, Int, Float, Int, Int, Int)].collect().toSet

    val cfg = FloodConfig()
    val batch = Seq(2, 5, 20).foldLeft(
      Normalize.forecast(raw, cfg.precision)
        .join(Normalize.roundKeys(thresholds, cfg.precision), Seq("latitude", "longitude"), "left")) {
      (df, n) => df.withColumn(s"exceed_${n}y",
        when(col("dis24") >= col(s"threshold_${n}y"), 1).otherwise(0))
    }

    assert(canon(spark.table("exc")) == canon(batch))
    assert(spark.table("exc").count() == 4) // null-dis24 row dropped
    // jittered key joined to its cell's thresholds
    assert(spark.table("exc").filter(col("number") === 1)
      .select("exceed_2y").as[Int].head() == 0)
  }

  test("partitionedSink lands alerts in date partitions, exactly once across reruns") {
    val src = Files.createTempDirectory("forecast-stream3")
    raw.write.mode("overwrite").parquet(src.toString)
    val out = Files.createTempDirectory("alert-sink").toString
    val ckpt = Files.createTempDirectory("ckpt3").toString
    def runOnce(): Unit = {
      val q = ForecastStream.partitionedSink(
        ForecastStream.alerts(ForecastStream.readForecast(spark, src.toString), thresholds,
          alertYears = 20),
        s"$out/alerts", ckpt).start()
      q.awaitTermination(120000)
    }
    runOnce()
    val first = spark.read.parquet(s"$out/alerts")
    assert(first.count() == 1)
    assert(new java.io.File(s"$out/alerts/issued_on=2023-10-01").isDirectory)
    // same checkpoint, no new source files → nothing reprocessed
    runOnce()
    assert(spark.read.parquet(s"$out/alerts").count() == 1)
  }

  test("windowed aggregation drops late events beyond the watermark across checkpointed runs") {
    import spark.implicits._
    val src = Files.createTempDirectory("late-events").toString
    val out = Files.createTempDirectory("late-out").toString
    val ckpt = Files.createTempDirectory("late-ckpt").toString
    val hourNs = 3600L * 1000000000L
    val t0 = 1700000000L * 1000000000L // batch 1 spans hours 0..9

    def writeBatch(rows: Seq[(Long, Long, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(src)

    def runOnce(): Unit = {
      val q = EventStream.windowedCounts(
        EventStream.readEvents(spark, src), watermarkDelay = "2 hours")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    writeBatch((0 until 10).map(h =>
      (h.toLong, t0 + h * hourNs, 1L, "view", 1.0)))
    runOnce() // watermark advances to hour 9 - 2h = hour 7; hours <7 finalized

    // batch 2: one event in hour 1 (far beyond the watermark → dropped)
    // and one in hour 9 (still open → accepted)
    writeBatch(Seq(
      (100L, t0 + 1 * hourNs + 1, 1L, "view", 1.0),
      (101L, t0 + 9 * hourNs + 1, 1L, "view", 1.0)))
    runOnce()
    // batch 3: advance the watermark far enough to flush every window
    writeBatch(Seq((102L, t0 + 20 * hourNs, 1L, "view", 1.0)))
    runOnce()

    val counts = spark.read.parquet(out)
      .select((col("window_start_us") / 3600000000L - t0 / 1000000000L / 3600).cast("int").as("hour"),
        col("n_events"))
      .as[(Int, Long)].collect().toMap
    assert(counts(1) == 1L, "late hour-1 event must NOT be re-counted")
    assert(counts(9) == 2L, "hour-9 event within watermark must be counted")
  }

  test("alerts keeps only threshold exceedances") {
    val dir = Files.createTempDirectory("forecast-stream2")
    raw.write.mode("overwrite").parquet(dir.toString)
    val checkpoint = Files.createTempDirectory("ckpt2").toString
    val q = ForecastStream.alerts(
      ForecastStream.readForecast(spark, dir.toString), thresholds, alertYears = 20)
      .writeStream
      .format("memory").queryName("alerts").outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.table("alerts").select("number").as[Long].collect().toSet == Set(3L))
  }
}
