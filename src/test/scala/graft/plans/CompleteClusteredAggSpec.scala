package graft.plans

import java.io.File

import graft.SparkSpec
import graft.functions.GraftExtensions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.aggregate.{Complete, Final, Partial}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{BaseAggregateExec, HashAggregateExec, ObjectHashAggregateExec}
import org.apache.spark.sql.functions._

/** [[CompleteClusteredAggregate]]: an adjacent partial+final aggregate
  * pair (exchange elided because the child is already clustered on the
  * grouping keys) merges into ONE complete-mode pass — and never fires
  * anywhere else. Results are asserted equal to the un-extended session's
  * on every path. */
class CompleteClusteredAggSpec extends SparkSpec {

  /** A session with the graft extensions injected, sharing the suite's
    * SparkContext. `spark.sql.extensions` is a static conf read from the
    * SparkContext's conf, so it cannot inject on a shared test context —
    * the programmatic `withExtensions(new GraftExtensions())` path (the
    * same function the conf would load) is used instead. getOrCreate only
    * builds a NEW SparkSession when the default/active slots are empty,
    * so they are cleared first and restored after. */
  private def withExtendedSession[A](f: SparkSession => A): A = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = org.apache.spark.sql.classic.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  /** Every aggregate exec in the plan, with adaptive wrappers unwrapped. */
  private def aggNodes(df: DataFrame): Seq[BaseAggregateExec] = {
    df.collect() // force execution so AQE finalizes its plan
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case s: QueryStageExec => flatten(s.plan)
      case other => other.children.flatMap(flatten)
    })
    flatten(df.queryExecution.executedPlan).collect { case b: BaseAggregateExec => b }
  }

  private def rows(df: DataFrame): Set[Seq[Any]] = df.collect().map(_.toSeq).toSet

  private def sampleDf(s: SparkSession): DataFrame = {
    import s.implicits._
    (1 to 1000).map(i => (i % 7, i % 13, i.toDouble)).toDF("k1", "k2", "v")
  }

  test("repartition-clustered ObjectHashAggregate merges to a single complete pass") {
    val expected = rows(
      sampleDf(spark).repartition(4, col("k1"), col("k2"))
        .groupBy("k1", "k2")
        .agg(expr("percentile(v, 0.5)").as("med"), sum("v").as("s")))
    withExtendedSession { s =>
      val agged = sampleDf(s).repartition(4, col("k1"), col("k2"))
        .groupBy("k1", "k2")
        .agg(expr("percentile(v, 0.5)").as("med"), sum("v").as("s"))
      assert(rows(agged) == expected)
      val aggs = aggNodes(agged)
      assert(aggs.length == 1, s"expected one merged aggregate, got:\n${aggs.mkString("\n")}")
      assert(aggs.head.isInstanceOf[ObjectHashAggregateExec])
      assert(aggs.head.aggregateExpressions.forall(_.mode == Complete))
    }
  }

  test("repartition-clustered HashAggregate merges to a single complete pass") {
    val expected = rows(
      sampleDf(spark).repartition(4, col("k1"))
        .groupBy("k1").agg(sum("v").as("s"), count(lit(1)).as("n")))
    withExtendedSession { s =>
      val agged = sampleDf(s).repartition(4, col("k1"))
        .groupBy("k1").agg(sum("v").as("s"), count(lit(1)).as("n"))
      assert(rows(agged) == expected)
      val aggs = aggNodes(agged)
      assert(aggs.length == 1, s"expected one merged aggregate, got:\n${aggs.mkString("\n")}")
      assert(aggs.head.isInstanceOf[HashAggregateExec])
      assert(aggs.head.aggregateExpressions.forall(_.mode == Complete))
    }
  }

  test("the conf safety valve disables the rewrite at runtime") {
    withExtendedSession { s =>
      s.conf.set(CompleteClusteredAggregate.EnabledKey, "false")
      try {
        val agged = sampleDf(s).repartition(4, col("k1"))
          .groupBy("k1").agg(sum("v").as("s"))
        assert(rows(agged) ==
          rows(sampleDf(spark).repartition(4, col("k1"))
            .groupBy("k1").agg(sum("v").as("s"))))
        val modes = aggNodes(agged).flatMap(_.aggregateExpressions.map(_.mode)).toSet
        assert(modes == Set(Partial, Final), s"expected the rewrite off, got modes $modes")
      } finally s.conf.unset(CompleteClusteredAggregate.EnabledKey)
    }
  }

  test("an unclustered groupBy keeps the partial+final split") {
    withExtendedSession { s =>
      val agged = sampleDf(s).groupBy("k1").agg(sum("v").as("s"))
      assert(rows(agged) ==
        rows(sampleDf(spark).groupBy("k1").agg(sum("v").as("s"))))
      val modes = aggNodes(agged).flatMap(_.aggregateExpressions.map(_.mode)).toSet
      assert(modes == Set(Partial, Final), s"expected a two-phase plan, got modes $modes")
    }
  }

  test("distinct aggregates are left alone and stay correct") {
    withExtendedSession { s =>
      val agged = sampleDf(s).repartition(4, col("k1"))
        .groupBy("k1").agg(countDistinct(col("k2")).as("d"), sum("v").as("sv"))
      assert(rows(agged) == rows(
        sampleDf(spark).repartition(4, col("k1"))
          .groupBy("k1").agg(countDistinct(col("k2")).as("d"), sum("v").as("sv"))))
    }
  }

  test("scan-reported step clustering plans ONE complete aggregate and zero exchanges") {
    val fixture = new File("data/grib/forecast.grib2").getAbsolutePath
    val expected = rows(
      spark.read.format(classOf[graft.sources.GribSource].getName)
        .option("path", fixture).load()
        .groupBy("latitude", "longitude", "step_hours")
        .agg(count(col("value")).as("n"),
          graft.functions.FiveNumberSummary(col("value")).as("fns"))
        .select(col("latitude"), col("longitude"), col("step_hours"),
          col("n"), col("fns.median").as("med")))
    withExtendedSession { s =>
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      try {
        val agged = s.read.format(classOf[graft.sources.GribSource].getName)
          .option("path", fixture).option("partitionByStep", "true").load()
          .groupBy("latitude", "longitude", "step_hours")
          .agg(count(col("value")).as("n"),
            graft.functions.FiveNumberSummary(col("value")).as("fns"))
          .select(col("latitude"), col("longitude"), col("step_hours"),
            col("n"), col("fns.median").as("med"))
        assert(rows(agged) == expected)
        val aggs = aggNodes(agged)
        assert(aggs.length == 1, s"expected one merged aggregate, got:\n${aggs.mkString("\n")}")
        assert(aggs.head.aggregateExpressions.forall(_.mode == Complete))
        assert(!agged.queryExecution.executedPlan.toString.contains("Exchange"))
      } finally s.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }
}
