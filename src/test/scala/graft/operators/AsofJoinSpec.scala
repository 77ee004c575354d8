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

  test("equivalent to the naive inequality-join+argmax on generated data") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = for {
      key <- Gen.oneOf("a", "b", "c", "d")
      t <- Gen.chooseNum(0L, 50L) // small domain → plenty of same-instant collisions
      v <- Gen.chooseNum(-100, 100)
    } yield (key, t, v)
    val rows = Gen.listOfN(400, rowGen).apply(Gen.Parameters.default, Seed(11L))
      .getOrElse(sys.error("gen failed"))
    val l = rows.take(250).zipWithIndex
      .map { case ((k, t, v), i) => (i.toLong, k, t, v) }.toDF("lid", "key", "t", "lv")
    // right side unique per (key, t): keep max v
    val r = rows.drop(250).groupBy(x => (x._1, x._2)).map { case ((k, t), xs) =>
      (k, t, xs.map(_._3).max.toDouble)
    }.toSeq.toDF("key", "t", "rate")

    val carried = AsofJoin(l, r, Seq("key"), "t", "rate")
      .select("lid", "rate").as[(Long, Option[Double])].collect().toMap

    val naive = l.join(r.withColumnRenamed("t", "rt"), Seq("key"), "left")
      .filter(col("rt").isNull || col("rt") <= col("t"))
      .groupBy("lid").agg(max_by(col("rate"), col("rt")).as("rate"))
      .as[(Long, Option[Double])].collect().toMap
    // naive drops left rows whose ONLY right rows are in the future; they
    // must be null in the carried result
    val missing = carried.keySet -- naive.keySet
    assert(missing.forall(carried(_).isEmpty))
    assert(naive.forall { case (id, rate) => carried(id) == rate })
    assert(carried.size == 250)
  }

  test("plans one shuffle per side and a window, no join operator at all") {
    val plan = AsofJoin(left, right, Seq("key"), "t", "rate")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected a join-free union+window plan:\n$plan")
    assert(plan.contains("Window"))
  }
}
