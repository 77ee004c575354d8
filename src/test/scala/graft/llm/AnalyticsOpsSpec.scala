package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** movingStats / outliers / rollup / pivot semantics. */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  // ts as epoch-micros longs via a timestamp col (Events.tsMicros handles both)
  private def events = Seq(
    (1L, 1000000L, 7L, "view", 1.0),
    (2L, 2000000L, 7L, "view", 2.0),
    (3L, 3000000L, 7L, "view", 3.0),
    (4L, 4000000L, 7L, "view", 4.0),
    (5L, 5000000L, 7L, "view", 100.0),
    (6L, 1000000L, 8L, "click", 10.0))
    .toDF("event_id", "us", "user_id", "event_type", "value")
    .withColumn("ts", timestamp_micros(col("us"))).drop("us")

  test("movingStats: trailing frame sums, lag/lead neighbors, seq") {
    val rows = Events.movingStats(events, window = 3)
      .filter(col("user_id") === 7)
      .orderBy("seq")
      .select("value_micros", "prev_value_micros", "next_value_micros",
        "moving_sum_micros", "n_in_window", "seq")
      .as[(Long, Option[Long], Option[Long], Long, Long, Long)].collect().toList
    assert(rows.map(_._1) == List(1000000L, 2000000L, 3000000L, 4000000L, 100000000L))
    assert(rows.map(_._2) == List(None, Some(1000000L), Some(2000000L), Some(3000000L), Some(4000000L)))
    assert(rows.map(_._3) == List(Some(2000000L), Some(3000000L), Some(4000000L), Some(100000000L), None))
    // 3-row trailing sums: 1, 1+2, 1+2+3, 2+3+4, 3+4+100 (in micros)
    assert(rows.map(_._4) == List(1000000L, 3000000L, 6000000L, 9000000L, 107000000L))
    assert(rows.map(_._5) == List(1L, 2L, 3L, 3L, 3L))
  }

  test("outliers: Tukey fences flag the far value only, exact == approx here") {
    val flagged = Events.outliers(events, factor = 1.5)
      .filter(col("is_outlier")).select("event_id").as[Long].collect().toSet
    assert(flagged == Set(5L)) // 100.0 among 1..4; click group has one row, no outlier
    val approx = Events.outliers(events, factor = 1.5, exact = false)
      .filter(col("is_outlier")).select("event_id").as[Long].collect().toSet
    assert(approx == Set(5L))
  }

  test("rankStats: total tiebroken order makes ranks, ratios, and tiles exact") {
    val rows = Events.rankStats(events).filter(col("event_type") === "view")
      .orderBy("rnk")
      .select("event_id", "rnk", "pct_rank", "cume", "quartile")
      .as[(Long, Long, Double, Double, Long)].collect().toList
    assert(rows.map(_._1) == List(1L, 2L, 3L, 4L, 5L)) // value order
    assert(rows.map(_._2) == List(1L, 2L, 3L, 4L, 5L)) // unique ranks (tiebreak)
    assert(rows.map(_._3) == List(0.0, 0.25, 0.5, 0.75, 1.0))
    assert(rows.map(_._4) == List(0.2, 0.4, 0.6, 0.8, 1.0))
    assert(rows.map(_._5) == List(1L, 1L, 2L, 3L, 4L)) // ntile(4) over 5 rows
  }

  test("histogram: clamped equi-width buckets with micros sums") {
    val h = Events.histogram(events, lo = 0.0, hi = 4.0, nBuckets = 4)
      .filter(col("event_type") === "view")
      .select("bucket", "bucket_lo", "n_events", "value_micros")
      .as[(Long, Double, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // values 1,2,3,4,100 in [0,4) w=1: 1.0->b1, 2.0->b2, 3.0->b3(last in range),
    // 4.0 and 100.0 clamp to b3
    assert(h(1L) == ((1.0, 1L, 1000000L)))
    assert(h(2L) == ((2.0, 1L, 2000000L)))
    assert(h(3L) == ((3.0, 3L, 107000000L)))
    assert(!h.contains(0L))
  }

  test("rollupReport: leaf, per-source, and grand-total levels with grouping ids") {
    val docs = Seq(
      ("a", "en", 10L), ("a", "de", 20L), ("b", "en", 30L))
      .toDF("source", "lang", "n_chars")
    val out = Mixture.rollupReport(docs, Seq("source", "lang"), "n_chars")
      .as[(Option[String], Option[String], Long, Long, Long)].collect().toSet
    assert(out.contains((Some("a"), Some("de"), 0L, 1L, 20L))) // leaf
    assert(out.contains((Some("a"), None, 1L, 2L, 30L))) // source subtotal
    assert(out.contains((None, None, 3L, 3L, 60L))) // grand total
    assert(out.size == 3 + 2 + 1)
  }

  test("pivotCounts: explicit values, zero-filled missing cells") {
    val docs = Seq(("a", "en"), ("a", "en"), ("a", "de"), ("b", "en"))
      .toDF("source", "lang")
    val out = Mixture.pivotCounts(docs, "source", "lang", Seq("de", "en", "zh"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (s, d, e, z) => s -> ((d, e, z)) }.toMap
    assert(out("a") == ((1L, 2L, 0L)))
    assert(out("b") == ((0L, 1L, 0L))) // de and zh cells zero, not null
  }
}
