package graft.queries

import graft.SparkSpec

/** Lifecycle of the per-(session, dir) plan memos: a long-lived embedding
  * must be able to retire a session's cached plans via `releaseMemos`
  * without restarting the JVM (the bench/Verify mains never need this —
  * their memo dies with the process). */
class FloodQueriesMemoSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("releaseMemos drops memoized plans and unpersists their cached data") {
    val pipeline = FloodQueries.queries("q_pipeline_e2e")
    val detailed = FloodQueries.queries("q_detailed_control")

    // memoization: repeated lookups share ONE DataFrame instance
    val d1 = pipeline(spark, dir)
    assert(pipeline(spark, dir) eq d1)

    // materialize both memos' caches and capture exactly the RDDs they pin
    val before = spark.sparkContext.getPersistentRDDs.keySet
    assert(d1.count() > 0)
    assert(detailed(spark, dir).count() > 0)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before

    FloodQueries.releaseMemos(spark)
    val remaining = spark.sparkContext.getPersistentRDDs.keySet
    assert(added.intersect(remaining).isEmpty,
      s"releaseMemos left cached RDDs ${added.intersect(remaining)} pinned")

    // the registry still works after release: plans rebuild lazily, and
    // the rebuilt pipeline is a NEW memo entry, not the dropped one
    val d2 = pipeline(spark, dir)
    assert(!(d2 eq d1))
    assert(d2.count() == d1.count())
  }
}
