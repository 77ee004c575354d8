package graft.llm

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("hoppingCounts reproduces Spark's native window(col, len, slide) cells") {
    import org.apache.spark.sql.functions._
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val got = Events.hoppingCounts(events)
      .select("window_start_us", "event_type", "n_events")
      .as[(Long, String, Long)].collect().toSet
    val native = events
      .select(timestamp_micros(Events.tsMicros(events)).as("et"), col("event_type"))
      .groupBy(window(col("et"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros(col("w.start").cast("timestamp")).as("ws"), col("event_type"), col("n_events"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == native)
    assert(got.nonEmpty)
  }

  test("retention: every cohort's week-0 cell retains 100% of the cohort") {
    import org.apache.spark.sql.functions._
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val week0 = Events.retention(events).filter(col("weeks_since") === 0)
      .select("n_active", "cohort_size", "retention")
      .as[(Long, Long, Double)].collect()
    assert(week0.nonEmpty)
    assert(week0.forall { case (a, s, r) => a == s && r == 1.0 })
  }

  test("funnel enforces strict step ordering per user") {
    // ts is a nanos long (DIV 1000 -> micros). u1 completes in order;
    // u2's first click precedes its view (must not count) but a later
    // click does; u3 views only; u4 has no funnel events at all.
    val e = Seq(
      (1L, 100000L, 1L, "view", 0.0),
      (2L, 200000L, 1L, "click", 0.0),
      (3L, 300000L, 1L, "purchase", 0.0),
      (4L, 100000L, 2L, "click", 0.0),
      (5L, 200000L, 2L, "view", 0.0),
      (6L, 300000L, 2L, "click", 0.0),
      (7L, 100000L, 3L, "view", 0.0),
      (8L, 100000L, 4L, "error", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.funnel(e)
      .select("user_id", "t1_us", "t2_us", "t3_us", "stage")
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, Some(100L), Some(200L), Some(300L), 3)))
    assert(got(2L) == ((2L, Some(200L), Some(300L), None, 2)))
    assert(got(3L) == ((3L, Some(100L), None, None, 1)))
    assert(got(4L) == ((4L, None, None, None, 0)))
  }
}
