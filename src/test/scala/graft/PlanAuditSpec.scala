package graft

/** Meta-audit over the whole driver registry: every query's physical plan
  * must be free of the accidental scale-killers. Runs at sf0.001 so the
  * eager operators (curation, clustering) stay cheap.
  *
  * BroadcastNestedLoopJoin is allowed — the brute-force ANN baseline and
  * the IVF centroid fan-out use it deliberately with a dimension-sized
  * broadcast side. CartesianProduct (both sides materialized, no
  * broadcast) is never acceptable in this library.
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("no registry query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("every query with an oracle is registered, and the flagship runs") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle SQL without a query: ${missing.mkString(", ")}")
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
