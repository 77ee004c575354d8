package graft.streaming

import graft.SparkSpec
import graft.llm.Events
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming/batch equivalence over the real sf0.001 events table: the
  * streaming operators must agree with the batch semantics they mirror. */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** File-source streams need a directory; the testdata is a single file. */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("events-stream")
    Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  private def runAvailableNow(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val checkpoint = Files.createTempDirectory("ckpt").toString
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
  }

  test("streaming windowedCounts (complete mode) matches batch on counts") {
    val checkpoint = Files.createTempDirectory("ckpt").toString
    val stream = EventStream.windowedCounts(EventStream.readEvents(spark, eventsDir))
    val q = stream.writeStream
      .format("memory").queryName("win").outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("win")
      .select("window_start_us", "event_type", "n_events", "value_micros")
      .as[(Long, String, Long, Long)].collect().toSet
    val batch = Events.windowedCounts(spark.read.parquet(s"$sfDir/events.parquet"))
      .select("window_start_us", "event_type", "n_events", "value_micros")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming exact dedup emits one row per distinct text (== batch distinct)") {
    val dir = Files.createTempDirectory("docs-stream")
    Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      dir.resolve("documents.parquet"))
    runAvailableNow(
      CorpusStream.streamingExactDedup(CorpusStream.readDocuments(spark, dir.toString)),
      "dedup")
    val streamed = spark.table("dedup")
    val batchDistinct = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("text"))).distinct().count()
    assert(streamed.count() == batchDistinct)
    assert(streamed.select("text_md5").distinct().count() == batchDistinct)
  }

  test("stream-stream view/click join matches the batch time-range join") {
    runAvailableNow(
      EventStream.viewClickJoin(EventStream.readEvents(spark, eventsDir)),
      "vcjoin")
    val streamed = spark.table("vcjoin")
      .select("user_id", "view_id", "click_id")
      .as[(Long, Long, Long)].collect().toSet

    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val e = raw.select(col("user_id"), col("event_id"), col("event_type"),
      Events.tsMicros(raw).as("ts_us"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts_us").as("view_us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"), col("ts_us").as("click_us"))
    val batch = views.join(clicks,
      col("user_id") === col("cu") &&
        col("click_us") > col("view_us") &&
        col("click_us") <= col("view_us") + 30L * 60 * 1000000)
      .select("user_id", "view_id", "click_id")
      .as[(Long, Long, Long)].collect().toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("dedup-within-watermark drops near duplicates and re-admits after eviction") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val src = Files.createTempDirectory("dedup-wm").toString
    val out = Files.createTempDirectory("dedup-wm-out").toString
    val ckpt = Files.createTempDirectory("dedup-wm-ckpt").toString
    val hourUs = 3600L * 1000000L
    val t0 = 1700000000L * 1000000L

    def writeBatch(rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("doc_id", "text", "t_us")
        .withColumn("event_time", timestamp_micros(col("t_us"))).drop("t_us")
        .coalesce(1).write.mode("append").parquet(src)

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING, event_time TIMESTAMP")
        .parquet(src)
      val q = CorpusStream.streamingDedupWithinWatermark(stream, "event_time", "1 hour")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    writeBatch(Seq((1L, "hello world", t0)))
    runOnce()
    // near-in-time duplicate (inside the horizon) + a watermark advancer
    writeBatch(Seq((2L, "hello world", t0 + 10 * 60 * 1000000L),
      (3L, "advance the clock", t0 + 5 * hourUs)))
    runOnce()
    // far-later duplicate: key state evicted by the advanced watermark
    writeBatch(Seq((4L, "hello world", t0 + 5 * hourUs + 1)))
    runOnce()

    val ids = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 4L), s"got $ids")
  }

  test("streaming sessionize emits exactly the batch sessions minus each user's open one") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    runAvailableNow(
      EventStream.sessionize(EventStream.toEventRows(
        EventStream.readEvents(spark, eventsDir))).toDF(),
      "sess")
    val streamed = spark.table("sess")
      .select("user_id", "session_id", "n_events", "session_start_us", "session_end_us", "value_micros")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet

    val batchAll = Events.sessionize(events)
      .select("user_id", "session_id", "n_events", "session_start_us", "session_end_us", "value_micros")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // drop each user's chronologically-last (still open) session
    val lastPerUser = batchAll.groupBy(_._1).map { case (u, ss) => (u, ss.map(_._2).max) }.toSet
    val batchCompleted = batchAll.filterNot(s => lastPerUser.contains((s._1, s._2))).toSet

    assert(streamed == batchCompleted)
    assert(streamed.nonEmpty)
  }
}
