package graft.llm

import graft.SparkSpec
import graft.streaming.EventStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Contract spec for the events `ts` unit: the driver has regenerated
  * `events.parquet` with different physical timestamp encodings across
  * rounds (nanos int64 read as LongType under
  * `spark.sql.legacy.parquet.nanosAsLong`, then TIMESTAMP(MICROS) read as
  * timestamp/timestamp_ntz). [[Events.tsMicros]] is the single source of
  * event-time truth; this spec pins that every encoding resolves to the
  * same epoch-micros values through (a) the batch helper, (b) the batch
  * windowed aggregation built on it, and (c) the streaming file source's
  * derived schema — so the next regeneration breaks loudly here instead of
  * silently shifting windows.
  */
class EventTimeUnitSpec extends SparkSpec {
  import spark.implicits._

  // one event per hour over 3 hours, plus an in-window straggler
  private val instantsUs =
    Seq(0L, 3599999999L, 3600000000L, 7200000001L)

  private def baseRows(tsCol: Long => Any): Seq[(Long, Any, Long, String, Double)] =
    instantsUs.zipWithIndex.map { case (us, i) =>
      (i.toLong + 1, tsCol(us), (i % 2).toLong, if (i % 2 == 0) "click" else "view", 1.5 * (i + 1))
    }

  /** Write a fixture with the given ts representation, return its path. */
  private def writeFixture(name: String, df: DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-tsunit-$name").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "events.parquet").getAbsolutePath
    df.coalesce(1).write.mode("overwrite").parquet(path)
    path
  }

  // LongType ts holding nanos — exactly how the engine sees a
  // TIMESTAMP(NANOS) parquet column under nanosAsLong (Spark cannot
  // author nanos-physical parquet itself, so the long form IS the
  // engine-visible equivalent).
  private lazy val nsLongPath = writeFixture("nslong",
    baseRows(us => us * 1000L)
      .map { case (id, ts, u, t, v) => (id, ts.asInstanceOf[Long], u, t, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value"))

  // TimestampType ts — parquet TIMESTAMP(MICROS, adjustedToUTC=true)
  private lazy val tsPath = writeFixture("micros",
    baseRows(us => java.sql.Timestamp.from(java.time.Instant.EPOCH.plusNanos(us * 1000L)))
      .map { case (id, ts, u, t, v) => (id, ts.asInstanceOf[java.sql.Timestamp], u, t, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value"))

  // TimestampNTZType ts — parquet TIMESTAMP(MICROS, adjustedToUTC=false),
  // the encoding the round-13 regeneration produced
  private lazy val ntzPath = writeFixture("ntz",
    baseRows(us => java.time.LocalDateTime.ofEpochSecond(
      us / 1000000L, ((us % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC))
      .map { case (id, ts, u, t, v) => (id, ts.asInstanceOf[java.time.LocalDateTime], u, t, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value"))

  private def allPaths = Seq("ns-long" -> nsLongPath, "us-timestamp" -> tsPath, "ntz" -> ntzPath)

  test("fixtures load with the three distinct physical ts types") {
    val types = allPaths.map { case (_, p) => spark.read.parquet(p).schema("ts").dataType }
    assert(types == Seq(LongType, TimestampType, TimestampNTZType))
  }

  test("tsMicros resolves every encoding to the same epoch-micros values") {
    for ((label, path) <- allPaths) {
      val df = spark.read.parquet(path)
      val got = df.select(col("event_id"), Events.tsMicros(df).as("ts_us"))
        .as[(Long, Long)].collect().toMap
      val want = instantsUs.zipWithIndex.map { case (us, i) => (i.toLong + 1) -> us }.toMap
      assert(got == want, s"encoding $label")
    }
  }

  test("windowedCounts is identical across encodings") {
    val results = allPaths.map { case (label, path) =>
      label -> Events.windowedCounts(spark.read.parquet(path))
        .as[(Long, String, Long, Long, Long, Double, Double)].collect().toSet
    }
    val (refLabel, ref) = results.head
    assert(ref.nonEmpty)
    for ((label, r) <- results.tail)
      assert(r == ref, s"$label differs from $refLabel")
  }

  test("streaming file source derives the physical ts type per encoding") {
    for ((label, path) <- allPaths) {
      val batchType = spark.read.parquet(path).schema("ts").dataType
      val streamType = EventStream.readEvents(spark, path).schema("ts").dataType
      assert(streamType == batchType, s"encoding $label")
    }
  }
}
