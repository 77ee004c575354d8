package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(
    (1L, "k1", 50L), (2L, "k1", 100L), (3L, "k1", 199L), (4L, "k1", 200L),
    (5L, "k1", 201L), (6L, "k2", 100L)).toDF("pid", "key", "t")

  private val intervals = Seq(
    ("k1", 10L, 100L, 200L), // [100, 200] inclusive
    ("k1", 11L, 150L, 160L),
    ("k2", 12L, 500L, 600L)).toDF("key", "iid", "s", "e")

  test("matches exactly the containing intervals, inclusive bounds, across buckets") {
    val got = RangeJoin.pointInInterval(points, intervals, Seq("key"), "t", "s", "e", 64L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 10L), (3L, 10L), (4L, 10L)))
  }

  test("agrees with the naive theta join for any bucket width") {
    val naive = points.join(intervals, Seq("key"))
      .filter(col("t").between(col("s"), col("e")))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val bucketed = RangeJoin.pointInInterval(points, intervals, Seq("key"), "t", "s", "e", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(bucketed == naive, s"bucketWidth=$w diverges")
    }
  }

  test("agrees with the naive theta join on generated data") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val ptGen = for {
      k <- Gen.oneOf("a", "b", "c"); t <- Gen.chooseNum(0L, 500L)
    } yield (k, t)
    val ivGen = for {
      k <- Gen.oneOf("a", "b", "c"); s <- Gen.chooseNum(0L, 500L); len <- Gen.chooseNum(0L, 120L)
    } yield (k, s, s + len)
    val ps = Gen.listOfN(200, ptGen).apply(Gen.Parameters.default, Seed(3L)).get
      .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }.toDF("pid", "key", "t")
    val ivs = Gen.listOfN(60, ivGen).apply(Gen.Parameters.default, Seed(4L)).get
      .zipWithIndex.map { case ((k, s, e), i) => (k, i.toLong, s, e) }.toDF("key", "iid", "s", "e")
    val naive = ps.join(ivs, Seq("key"))
      .filter(col("t").between(col("s"), col("e")))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (w <- Seq(13L, 64L, 121L)) {
      val got = RangeJoin.pointInInterval(ps, ivs, Seq("key"), "t", "s", "e", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == naive, s"bucketWidth=$w diverges on generated data")
    }
    assert(naive.nonEmpty)
  }

  test("inverted intervals (end < start) match nothing instead of exploding") {
    val inverted = intervals.union(Seq(("k1", 99L, 300L, 100L)).toDF("key", "iid", "s", "e"))
    val got = RangeJoin.pointInInterval(points, inverted, Seq("key"), "t", "s", "e", 64L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(!got.exists(_._2 == 99L))
    assert(got == Set((2L, 10L), (3L, 10L), (4L, 10L)))
  }

  test("plans an equi hash/merge join, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, intervals, Seq("key"), "t", "s", "e", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"expected an equi join:\n$plan")
  }
}
