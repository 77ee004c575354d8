package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, "u1", 100L, 1.0),
    (2L, "u1", 200L, 2.0),
    (3L, "u1", 250L, 3.0),
    (4L, "u2", 150L, 4.0),
    (5L, "u3", 500L, 5.0)).toDF("event_id", "key", "t", "v")

  private val right = Seq(
    ("u1", 100L, 10.0), // same instant as event 1 → visible to it
    ("u1", 240L, 24.0),
    ("u2", 160L, 16.0)) // after u2's only event → never matched
    .toDF("key", "t", "rate")

  test("matches the latest right row at or before each left time, per key") {
    val got = AsofJoin(left, right, Seq("key"), "t", "rate")
      .select("event_id", "rate").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(
      1L -> Some(10.0), // inclusive same-instant match
      2L -> Some(10.0), // 240 is later than 200
      3L -> Some(24.0),
      4L -> None,       // right row is in the future
      5L -> None))      // key with no right rows at all
  }

  test("preserves every left row and column") {
    val out = AsofJoin(left, right, Seq("key"), "t", "rate")
    assert(out.count() == left.count())
    assert(out.columns.toSeq == Seq("event_id", "key", "t", "v", "rate"))
  }

  test("rejects payload columns that collide with left columns") {
    val bad = right.withColumnRenamed("rate", "v")
    val e = intercept[IllegalArgumentException] {
      AsofJoin(left, bad, Seq("key"), "t", "v")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("plans one shuffle per side and a window, no join operator at all") {
    val plan = AsofJoin(left, right, Seq("key"), "t", "rate")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected a join-free union+window plan:\n$plan")
    assert(plan.contains("Window"))
  }
}
