package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SpaceSaving heavy-hitters aggregate: exactness below capacity, sketch
  * bounds above it, merge behavior under repartitioning, SQL surface. */
class TopKFreqSpec extends SparkSpec {
  import spark.implicits._

  private def exactCounts(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def sketch(items: Seq[String], k: Int, capacity: Int, parts: Int = 4) =
    items.toDF("item").repartition(parts)
      .agg(TopKFreq(col("item"), k, capacity).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select("h.item", "h.est", "h.err")
      .as[(String, Long, Long)].collect()

  test("exact below capacity: est = true count, err = 0, (est desc, item asc) order") {
    val items = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d")
    val got = sketch(scala.util.Random.shuffle(items), k = 3, capacity = 16)
    assert(got.toSeq == Seq(("a", 5L, 0L), ("b", 3L, 0L), ("c", 3L, 0L)))
  }

  test("null items are ignored") {
    val got = Seq(Some("a"), None, Some("a"), None).toDF("item")
      .agg(TopKFreq(col("item"), 2, 8).as("hh"))
      .select(size(col("hh")).as("n"), col("hh")(0).getField("est").as("e"))
      .as[(Int, Long)].head()
    assert(got == ((1, 2L)))
  }

  test("sketch bounds hold under eviction and arbitrary partitioning (seeded fuzz)") {
    val rnd = new scala.util.Random(20260814L)
    for (round <- 1 to 25) {
      // skewed stream over a universe larger than the capacity
      val n = 50 + rnd.nextInt(350)
      val items = Seq.fill(n) {
        if (rnd.nextInt(5) < 3) "h" + (1 + rnd.nextInt(3)) // heavy
        else "t" + rnd.nextInt(41) // long tail
      }
      val parts = 1 + rnd.nextInt(6)
      val capacity = 4 + rnd.nextInt(9)
      val truth = exactCounts(items)
      // k = capacity: the completeness guarantee speaks about the sketch
      val got = sketch(items, capacity, capacity, parts)
      val label = s"round $round (n=$n parts=$parts capacity=$capacity)"
      got.foreach { case (item, est, err) =>
        assert(est - err <= truth(item) && truth(item) <= est,
          s"$label: bounds broken for $item: est=$est err=$err true=${truth(item)}")
      }
      val reported = got.map(_._1).toSet
      truth.foreach { case (item, c) =>
        assert(c <= n / (capacity + 1) || reported(item),
          s"$label: heavy item $item (true=$c > ${n / (capacity + 1)}) missing")
      }
      // lower-bound counters never exceed the stream length
      assert(got.map(g => g._2 - g._3).sum <= n, s"$label: counter mass exceeds n")
      // the uniform overcount bound respects the epoch budget
      got.headOption.foreach { case (_, _, err) =>
        assert(err <= n / (capacity + 1), s"$label: delta=$err > ${n / (capacity + 1)}")
      }
    }
  }

  test("capacity-1 degenerates to a majority-style counter with valid bounds") {
    val items = Seq("a", "b", "a", "c", "a", "a")
    val got = sketch(items, k = 1, capacity = 1, parts = 1)
    assert(got.length == 1)
    val (item, est, err) = got.head
    val truth = exactCounts(items).getOrElse(item, 0L)
    assert(est - err <= truth && truth <= est && est <= items.length)
  }

  test("SQL surface: graft_topk_freq with literal k/capacity") {
    GraftExtensions.register(spark)
    Seq("x", "y", "x").toDF("item").createOrReplaceTempView("hh_in")
    val got = spark.sql(
      "SELECT explode(graft_topk_freq(item, 1, 8)) AS h FROM hh_in")
      .select("h.item", "h.est").as[(String, Long)].collect()
    assert(got.toSeq == Seq(("x", 2L)))
  }
}
