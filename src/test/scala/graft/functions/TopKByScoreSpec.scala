package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Direct fuzz of the mergeable top-k aggregate against a sort-take
  * model, across partitionings and group shapes. */
class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  private def model(rows: Seq[(Long, Double, Long)], k: Int): Map[Long, Seq[(Long, Double)]] =
    rows.groupBy(_._1).view.mapValues(
      _.map(r => (r._3, r._2))
        .sortBy { case (id, s) => (-s, id) }
        .take(k)).toMap

  test("equals the sort-take model under any partitioning; ties break by id") {
    val rnd = new scala.util.Random(160815)
    for (round <- 0 until 12) {
      val n = 50 + rnd.nextInt(400)
      val k = 1 + rnd.nextInt(8)
      // coarse scores force plenty of exact ties
      val rows = (0 until n).map(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(6).toDouble / 2.0, i.toLong))
      val df = rows.toDF("g", "s", "id").repartition(1 + rnd.nextInt(7))
      val got = df.groupBy("g")
        .agg(TopKByScore(col("s"), col("id"), k).as("t"))
        .collect()
        .map(r => r.getLong(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getDouble(1))))
        .toMap
      assert(got == model(rows, k), s"round $round (n=$n k=$k)")
    }
  }

  test("nulls are ignored; empty group yields an empty array") {
    val df = Seq(
      (1L, Some(2.0), Some(10L)),
      (1L, None, Some(11L)),
      (1L, Some(3.0), None),
      (2L, None, None)
    ).toDF("g", "s", "id")
    val got = df.groupBy("g")
      .agg(TopKByScore(col("s").cast("double"), col("id"), 5).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).length)
      .toMap
    assert(got == Map(1L -> 1, 2L -> 0))
  }
}
