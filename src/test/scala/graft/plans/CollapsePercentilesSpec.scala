package graft.plans

import graft.SparkSpec
import graft.functions.FiveNumberSummary
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Percentile}
import org.apache.spark.sql.functions._

/** CollapsePercentiles: plan shape + bit-identical results. */
class CollapsePercentilesSpec extends SparkSpec {
  import spark.implicits._

  private def flood = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    .select(
      (col("l_partkey") % 40).as("cell"),
      (col("l_quantity") * (lit(1.0) + col("l_discount"))).as("dis24"))

  private def fiveAggQuery(df: DataFrame): DataFrame =
    df.groupBy("cell").agg(
      min(col("dis24")).as("min_dis"),
      percentile(col("dis24"), lit(0.25)).as("q1_dis"),
      percentile(col("dis24"), lit(0.5)).as("median_dis"),
      percentile(col("dis24"), lit(0.75)).as("q3_dis"),
      max(col("dis24")).as("max_dis"))

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ CollapsePercentiles
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == CollapsePercentiles)
  }

  private def aggFunctions(df: DataFrame) =
    df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.aggregateExpressions.flatMap(_.collect { case ae: AggregateExpression => ae.aggregateFunction })
    }.flatten

  test("five quartile/min/max buffers collapse to one FiveNumberSummary") {
    withRule {
      val fns = aggFunctions(fiveAggQuery(flood))
      assert(fns.size == 1, s"expected one aggregate function, got $fns")
      assert(fns.head.isInstanceOf[FiveNumberSummary])
    }
  }

  test("rewritten results are bit-identical to the unoptimized plan") {
    val base = fiveAggQuery(flood).collect().map(_.toSeq).toSet
    val rewritten = withRule(fiveAggQuery(flood).collect().map(_.toSeq).toSet)
    assert(rewritten == base)
  }

  test("mixed outputs: untouched aggregates survive alongside the fold") {
    withRule {
      val df = flood.groupBy("cell").agg(
        count(lit(1)).as("n"),
        percentile(col("dis24"), lit(0.25)).as("q1_dis"),
        (percentile(col("dis24"), lit(0.5)) * 2.0).as("double_median"),
        avg(col("dis24")).as("mean_dis"))
      val fns = aggFunctions(df)
      assert(fns.count(_.isInstanceOf[FiveNumberSummary]) == 1)
      assert(fns.count(_.isInstanceOf[Percentile]) == 0)
      assert(fns.size == 3, s"five-num + count + avg expected, got $fns") // count, avg pass through
      val rows = df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      val base = flood.groupBy("cell").agg(
        count(lit(1)).as("n"),
        percentile(col("dis24"), lit(0.25)).as("q1_dis"),
        (percentile(col("dis24"), lit(0.5)) * 2.0).as("double_median"),
        avg(col("dis24")).as("mean_dis"))
      // compare against a fresh plan outside the rule
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == CollapsePercentiles)
      val baseRows = base.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      assert(rows.toMap == baseRows.toMap)
    }
  }

  test("does not fire on a lone percentile or non-double children") {
    withRule {
      val lone = flood.groupBy("cell").agg(percentile(col("dis24"), lit(0.5)).as("m"))
      assert(aggFunctions(lone).exists(_.isInstanceOf[Percentile]))
      val ints = Seq((1L, 10L), (1L, 20L)).toDF("k", "v").groupBy("k").agg(
        percentile(col("v"), lit(0.25)).as("a"),
        percentile(col("v"), lit(0.5)).as("b"),
        percentile(col("v"), lit(0.75)).as("c"))
      assert(aggFunctions(ints).count(_.isInstanceOf[Percentile]) == 3)
    }
  }

  test("grouping attribute referenced inside an aliased expression binds and matches") {
    def mk() = flood.groupBy("cell").agg(
      (percentile(col("dis24"), lit(0.25)) + col("cell")).as("q1_plus_cell"),
      percentile(col("dis24"), lit(0.5)).as("median_dis"),
      percentile(col("dis24"), lit(0.75)).as("q3_dis"))
    val rewritten = withRule {
      val df = mk()
      assert(aggFunctions(df).count(_.isInstanceOf[FiveNumberSummary]) == 1)
      df.collect().map(_.toSeq).toSet // used to fail binding: `cell` was dropped
    }
    assert(rewritten == mk().collect().map(_.toSeq).toSet)
  }

  test("distinct and filtered aggregates are left untouched") {
    withRule {
      val df = flood.groupBy("cell").agg(
        percentile(col("dis24"), lit(0.25)).as("a"),
        percentile(col("dis24"), lit(0.5)).as("b"),
        sum_distinct(col("dis24")).as("sd"))
      val fns = aggFunctions(df)
      assert(fns.count(_.isInstanceOf[FiveNumberSummary]) == 1)
      assert(fns.size == 2) // five-num + distinct sum
      df.collect() // and it still executes
    }
  }
}
