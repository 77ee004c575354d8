package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join: exactness, pruning, degenerate sizes. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

  private def expected = {
    val dim = events.filter(col("event_type") === "purchase" && col("value") > 90)
      .select("user_id").distinct()
    events.select("event_id", "user_id").join(dim, Seq("user_id"), "left_semi")
      .select("event_id", "user_id") // using-join moves the key column first
      .as[(Long, Long)].collect().toSet
  }

  test("semiJoin output is exactly the plain left_semi join") {
    val dim = events.filter(col("event_type") === "purchase" && col("value") > 90)
      .select("user_id")
    val got = Bloom.semiJoin(events.select("event_id", "user_id"), dim, "user_id")
      .select("event_id", "user_id")
      .as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("a degenerate 64-bit filter (every probe passes) is still exact") {
    val dim = events.filter(col("event_type") === "purchase" && col("value") > 90)
      .select("user_id")
    val got = Bloom.semiJoin(events.select("event_id", "user_id"), dim, "user_id",
      mBits = 64, numHashes = 2)
      .select("event_id", "user_id")
      .as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("the probe prunes non-members and never drops a member") {
    val mBits = 1 << 16
    val dimKeys = events.filter(col("event_type") === "purchase" && col("value") > 90)
      .select("user_id").distinct()
    val bf = Bloom.build(dimKeys, "user_id", mBits, 5)
    val candidates = events.select("event_id", "user_id")
      .crossJoin(broadcast(bf))
      .filter(Bloom.mightContain(col("bf"), col("user_id"), mBits, 5))
    val candidateIds = candidates.select("event_id").as[Long].collect().toSet
    val matchIds = expected.map(_._1)
    assert(matchIds.subsetOf(candidateIds), "bloom dropped a true member")
    val total = events.count()
    assert(candidateIds.size < total,
      s"bloom pruned nothing (${candidateIds.size} of $total)")
  }
}
