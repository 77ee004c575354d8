package graft.transforms

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{ProjectExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Physical-plan audit of the fused summary stage ([[Summary.onePass]] +
  * [[Geometry.addWkt]]): the shape that must hold at 100× the operational
  * day is (a) exactly ONE shuffle for the whole stage, (b) the peak
  * struct-argmax evaluated inside the aggregate operator (not a window +
  * self-join), and (c) the post-aggregation projection — WKT concat,
  * tendency/intensity/timing CASE chains — inside a WholeStageCodegen
  * span, with real headroom under `spark.sql.codegen.maxFields` so a
  * wider summary schema doesn't silently drop the stage out of codegen.
  */
class SummaryCodegenAuditSpec extends SparkSpec {

  /** Synthetic detailed-with-control frame with the stage's full input
    * schema; values are deterministic arithmetic on the row id. */
  private def detailedWithControl: DataFrame =
    spark.range(4000).select(
      ((col("id") % 40) / 10.0).as("latitude"),
      ((col("id") / 40 % 25) / 10.0).as("longitude"),
      to_date(lit("2023-10-01")).as("issued_on"),
      ((col("id") % 30) + 1).cast("int").as("step"),
      date_add(to_date(lit("2023-10-01")), ((col("id") % 30) + 1).cast("int")).as("valid_for"),
      ((col("id") % 97).cast("double") * 3.7).as("median_dis"),
      lit(150.0).as("control_dis"),
      ((col("id") % 97).cast("double") * 4.1).as("max_dis"),
      ((col("id") % 97).cast("double") * 2.3).as("min_dis"),
      ((col("id") % 11).cast("double") / 10.0).as("p_above_20y"),
      ((col("id") % 7).cast("double") / 6.0).as("p_above_5y"),
      ((col("id") % 5).cast("double") / 4.0).as("p_above_2y"))

  /** Every node in the physical tree, descending through AQE wrappers. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.inputPlan)
      case other => other.children.flatMap(flatten)
    }
    p +: nested
  }

  /** Run `f` with AQE off: the pre-execution executedPlan is then the
    * final plan, codegen stages inserted — what these audits inspect
    * (under AQE the same shape materializes per query stage only at
    * execution time). */
  private def withAqeOff[T](f: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, prev)
  }

  private def summaryGeo: DataFrame =
    Geometry.addWkt(Summary.onePass(detailedWithControl), 0.025, 3)
      .filter(col("intensity") =!= graft.config.Codes.Intensity.Gray)

  test("fused summary stage plans exactly one shuffle") {
    withAqeOff {
      val nodes = flatten(summaryGeo.queryExecution.executedPlan)
      val shuffles = nodes.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.size == 1,
        s"expected 1 exchange, found ${shuffles.size}:\n${shuffles.mkString("\n")}")
    }
  }

  test("peak argmax hash-aggregates: no window, no join, no sort") {
    withAqeOff {
      val nodes = flatten(summaryGeo.queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
        "fused stage must not plan a Window")
      assert(!nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec]),
        "fused stage must not plan a join")
      // ArgMaxRow's flattened scalar buffer is what keeps this a
      // HashAggregate — max(struct(...)) would carry a struct buffer and
      // fall back to SortAggregateExec, sorting the full fact input on
      // both sides of the exchange (the regression this pins against).
      assert(!nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.aggregate.SortAggregateExec]),
        "fused stage must hash-aggregate, not sort-aggregate:\n" +
          summaryGeo.queryExecution.executedPlan.toString)
      val hashAggs = nodes.collect {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a }
      assert(hashAggs.nonEmpty)
      assert(hashAggs.exists(_.aggregateExpressions.exists(
        _.aggregateFunction.isInstanceOf[graft.functions.ArgMaxRow])),
        "expected the ArgMaxRow peak argmax inside the hash aggregate")
    }
  }

  /** True iff some WholeStageCodegen span contains a Project emitting
    * `marker`. */
  private def markerProjectCodegend(df: DataFrame, marker: String): Boolean =
    flatten(df.queryExecution.executedPlan)
      .collect { case w: WholeStageCodegenExec => w }
      .exists(w => flatten(w).exists {
        case p: ProjectExec => p.output.exists(_.name == marker)
        case _ => false
      })

  test("WKT + classification projection is whole-stage-codegen'd") {
    withAqeOff {
      assert(markerProjectCodegend(summaryGeo, "wkt"),
        "the wkt-emitting Project must sit inside a WholeStageCodegen span:\n" +
          summaryGeo.queryExecution.executedPlan.toString)
    }
  }

  test("codegen survives a summary schema ~4x wider (maxFields headroom)") {
    withAqeOff {
      val maxFields = spark.conf.get("spark.sql.codegen.maxFields").toInt
      val width = summaryGeo.schema.size
      assert(width * 4 <= maxFields,
        s"summary width $width has < 4x headroom under codegen.maxFields=$maxFields")
      // widen the post-agg projection to just under the limit and confirm
      // the wkt Project still codegens — the growth VERDICT r13 item 8
      // asks about (more per-cell stats joining the summary schema)
      val extras = (1 to (maxFields - width - 2)).map(i =>
        (col("latitude") * i).as(s"extra_$i"))
      val wide = summaryGeo.select(col("*") +: extras: _*)
      assert(markerProjectCodegend(wide, "wkt"),
        s"wkt Project fell out of codegen at ${wide.schema.size} columns " +
          s"(maxFields=$maxFields)")
    }
  }
}
