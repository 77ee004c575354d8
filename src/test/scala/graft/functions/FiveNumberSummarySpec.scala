package graft.functions

import graft.SparkSpec
import graft.queries.FloodShaped
import graft.transforms.ThresholdPercentages

class FiveNumberSummarySpec extends SparkSpec {

  test("ExactOnePass equals the three-percentile Exact mode on real flood-shaped data") {
    val dir = "/root/testdata/sf0.001"
    val f = FloodShaped.forecast(spark, dir)
    val t = FloodShaped.thresholds(spark, dir)
    val exact = ThresholdPercentages(f, t, mode = ThresholdPercentages.Exact)
    val onePass = ThresholdPercentages(f, t, mode = ThresholdPercentages.ExactOnePass)
    assert(exact.columns.toSeq == onePass.columns.toSeq)
    assert(onePass.exceptAll(exact).isEmpty && exact.exceptAll(onePass).isEmpty)
    assert(onePass.count() > 0)
  }

  test("independently-built ExactOnePass plans canonicalize equal (cache matching)") {
    // Spark's CacheManager matches canonicalized plans: two registry
    // queries that each build `detailed` from scratch must share ONE
    // materialization. A TypedImperativeAggregate with broken equality /
    // canonicalization would silently recompute instead — this pins it.
    val dir = "/root/testdata/sf0.001"
    def build() = ThresholdPercentages(
      FloodShaped.forecast(spark, dir), FloodShaped.thresholds(spark, dir),
      mode = ThresholdPercentages.ExactOnePass)
    val a = build()
    val b = build()
    assert(a.queryExecution.analyzed.canonicalized == b.queryExecution.analyzed.canonicalized)
    a.cache()
    try {
      b.count()
      val cached = b.queryExecution.withCachedData.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
      }
      assert(cached.nonEmpty, "second build must hit the first build's cache entry")
    } finally a.unpersist()
  }

  test("decimal input aggregates via Decimal.toDouble (no MatchError)") {
    import spark.implicits._
    val df = Seq(("g", BigDecimal("1.50")), ("g", BigDecimal("2.50")), ("g", BigDecimal("3.50")))
      .toDF("k", "v")
    val r = df.groupBy("k").agg(FiveNumberSummary(org.apache.spark.sql.functions.col("v")).as("s"))
      .selectExpr("s.min", "s.median", "s.max").head()
    assert(r.getDouble(0) == 1.5 && r.getDouble(1) == 2.5 && r.getDouble(2) == 3.5)
  }

  test("non-numeric input fails analysis with a clear type error") {
    import spark.implicits._
    val df = Seq(("g", "oops")).toDF("k", "v")
    val e = intercept[Exception] {
      df.groupBy("k").agg(FiveNumberSummary(org.apache.spark.sql.functions.col("v")).as("s"))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("numeric"))
  }

  test("five-number summary on a tiny hand-checked group") {
    import spark.implicits._
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0)).toDF("k", "v")
    val r = df.groupBy("k").agg(FiveNumberSummary(org.apache.spark.sql.functions.col("v")).as("s"))
      .selectExpr("s.min", "s.q1", "s.median", "s.q3", "s.max").head()
    // type-7 on [1,2,3,4]: q1 = 1.75, median = 2.5, q3 = 3.25
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 1.75 &&
      r.getDouble(2) == 2.5 && r.getDouble(3) == 3.25 && r.getDouble(4) == 4.0)
  }
}
