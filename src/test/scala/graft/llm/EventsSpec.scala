package graft.llm

import graft.SparkSpec

class EventsSpec extends SparkSpec {
  import spark.implicits._

  // ts as epoch-micros longs * 1000 = the nanos-long physical form the
  // testdata parquet produces under nanosAsLong
  private def events(rows: (Long, Long, Long, String, Double)*) =
    rows.map { case (id, tsUs, user, typ, v) => (id, tsUs * 1000, user, typ, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")

  private val H = 3600000000L // 1h in micros

  test("windowedCounts buckets by tumbling window and type, micros-exact sums") {
    val d = events(
      (1L, 0L, 1L, "click", 1.5),
      (2L, H - 1, 2L, "click", 2.25),
      (3L, H, 1L, "click", 4.0),
      (4L, 10L, 1L, "view", 0.125))
    val got = Events.windowedCounts(d)
      .select("window_start_us", "event_type", "n_events", "n_users", "value_micros")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, "click", 2L, 2L, 3750000L),
      (H, "click", 1L, 1L, 4000000L),
      (0L, "view", 1L, 1L, 125000L)))
  }

  test("sessionize splits on gaps > 30min and aggregates per session") {
    val m = 60000000L // 1 min in micros
    val d = events(
      (1L, 0L, 7L, "click", 1.0),
      (2L, 10 * m, 7L, "click", 2.0), // same session (10 min gap)
      (3L, 50 * m, 7L, "click", 4.0), // new session (40 min gap)
      (4L, 0L, 8L, "view", 8.0)) // other user
    val got = Events.sessionize(d)
      .select("user_id", "session_id", "n_events", "session_start_us", "session_end_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (7L, 1L, 2L, 0L, 10 * m),
      (7L, 2L, 1L, 50 * m, 50 * m),
      (8L, 1L, 1L, 0L, 0L)))
  }

  test("windowedCounts on timestamp-typed input matches the long-nanos path") {
    val d = Seq((1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(3600)), 1L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.windowedCounts(d).select("window_start_us").as[Long].head()
    assert(got == H)
  }
}
