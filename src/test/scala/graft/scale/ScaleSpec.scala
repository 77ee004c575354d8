package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg matches the unsalted aggregation on a skewed key") {
    val df = (Seq.fill(1000)("hot") ++ Seq("a", "b", "c")).zipWithIndex
      .toDF("k", "v")
    val got = Skew.saltedAgg(df, Seq("k"), 8,
      count(lit(1)).as("c"), sum(col("c")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("hot" -> 1000L, "a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("saltedAggs matches the unsalted multi-aggregate on a skewed key") {
    val df = ((1 to 1000).map(i => ("hot", i)) ++ Seq(("a", -5), ("b", 7))).toDF("k", "v")
    val got = Skew.saltedAggs(df, Seq("k"), 8, Seq(
      count(lit(1)).as("pc") -> sum(col("pc")).as("n"),
      sum(col("v")).as("ps") -> sum(col("ps")).as("s"),
      min(col("v")).as("pmin") -> min(col("pmin")).as("mn"),
      max(col("v")).as("pmax") -> max(col("pmax")).as("mx")))
      .as[(String, Long, Long, Int, Int)].collect().toSet
    val want = df.groupBy("k").agg(
      count(lit(1)).as("n"), sum(col("v")).as("s"), min(col("v")).as("mn"), max(col("v")).as("mx"))
      .as[(String, Long, Long, Int, Int)].collect().toSet
    assert(got == want)
  }

  test("saltedJoin matches the plain join, including rows unmatched on left") {
    val large = (Seq.fill(500)(("hot", 1)) ++ Seq(("a", 2), ("miss", 3))).toDF("k", "v")
    val dim = Seq(("hot", 10.0), ("a", 20.0), ("unused", 30.0)).toDF("k", "w")
    val salted = Skew.saltedJoin(large, dim, Seq("k"), 8, "left")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("w").as("sw"))
      .as[(String, Long, Option[Double])].collect().toSet
    val plain = large.join(dim, Seq("k"), "left")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("w").as("sw"))
      .as[(String, Long, Option[Double])].collect().toSet
    assert(salted == plain)
    assert(salted.exists(_._1 == "miss")) // left rows survive
  }

  test("co-bucketed join plans with zero Exchange operators") {
    val wh = java.nio.file.Files.createTempDirectory("wh")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = (0 until 1000).map(i => (i.toLong, s"l$i")).toDF("id", "lv")
      val right = (0 until 1000).map(i => (i.toLong, i * 2.0)).toDF("id", "rv")
      Layout.writeBucketed(left, "bkt_left", 4, Seq("id"))
      Layout.writeBucketed(right, "bkt_right", 4, Seq("id"))
      val joined = Layout.bucketedJoin(spark, "bkt_left", "bkt_right", Seq("id"))
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
