package graft.scale

import graft.SparkSpec
import graft.transforms.Summary
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec}
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Skew posture of the scale-critical exchanges, pinned mechanically.
  *
  * The summary stage groups by (latitude, longitude) — river-network
  * skewed at real scale. Its defense is NOT AQE: a partial (map-side)
  * hash aggregate collapses every hot cell to one buffer row per map
  * partition BEFORE the exchange, so the shuffle carries O(cells ×
  * mappers) rows regardless of how hot a cell gets. The first test
  * injects a 100× hot cell and asserts that bound from the executed
  * plan's metrics — if someone reorders the plan so raw fact rows reach
  * the exchange (e.g. a pre-agg projection forces the aggregation to
  * final-only), this catches it.
  *
  * Where a TRUE shuffle join exists (no broadcastable side — the shape
  * Dedup/AsofJoin pair joins degrade to when both sides are fact-sized),
  * the engine leans on AQE's skew-join split: the second test builds a
  * hot-key sort-merge join above the skew thresholds and asserts the
  * final adaptive plan actually split the skewed partition
  * (`isSkewJoin` / `AQEShuffleReadExec.hasSkewedPartition`), and that
  * results are identical to the AQE-off run. [[Skew.saltedAggs]] /
  * [[Skew.saltedJoin]] stay the fallback for degenerate single-key skew
  * (oracle-checked by `q_salted_agg`). */
class AqeSkewSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      // materialized stages are leaves in the adaptive tree — descend
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => flatten(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => flatten(r.child)
      case other => other.children.flatMap(flatten)
    }
    p +: nested
  }

  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Synthetic detailed-with-control input (SummaryCodegenAuditSpec's
    * shape) over `cells` distinct cells × 30 steps, plus one HOT cell
    * carrying `hotFactor` × the per-cell row count. */
  private def skewedDetailed(cells: Int, hotFactor: Int): DataFrame = {
    def rows(n: Long, lat: org.apache.spark.sql.Column,
        lon: org.apache.spark.sql.Column): DataFrame =
      spark.range(n).select(
        lat.as("latitude"), lon.as("longitude"),
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
    val base = rows(cells.toLong * 30,
      (col("id") % cells) / 20.0, ((col("id") % cells) % 20) / 20.0)
    val hot = rows(30L * hotFactor, lit(99.9), lit(99.9))
    base.unionAll(hot)
  }

  test("100x hot cell never reaches the summary exchange: partial agg absorbs it") {
    val cells = 200
    val df = skewedDetailed(cells, hotFactor = 100).repartition(8)
    val out = Summary.onePass(df)
    out.collect() // execute so metrics fill
    val nodes = flatten(out.queryExecution.executedPlan)
    val partials = nodes.collect {
      case h: HashAggregateExec
          if h.aggregateExpressions.exists(_.mode ==
            org.apache.spark.sql.catalyst.expressions.aggregate.Partial) => h
    }
    assert(partials.nonEmpty, "summary stage must plan a partial hash aggregate")
    val shuffled = partials.map(_.metrics("numOutputRows").value).sum
    val inputRows = cells * 30L + 30L * 100
    val bound = (cells + 1).toLong * 8 // one buffer row per (cell, mapper)
    assert(shuffled <= bound,
      s"exchange saw $shuffled rows; partial agg should bound it by $bound")
    assert(shuffled < inputRows / 4,
      s"exchange saw $shuffled of $inputRows input rows — skew not absorbed")
    // the hot cell aggregates to exactly one output row like any other
    assert(out.queryExecution.executedPlan.isInstanceOf[SparkPlan])
    val got = Summary.onePass(skewedDetailed(cells, 100))
      .filter(col("latitude") === 99.9).count()
    assert(got == 1)
  }

  test("skewed shuffle join: AQE splits the hot partition, same results") {
    // hot key 7 carries ~60k fat rows; the rest spread thin. Thresholds
    // lowered so the hot partition qualifies at test scale.
    def fact = spark.range(80000).select(
      when(col("id") < 60000, lit(7L)).otherwise(col("id") % 64).as("k"),
      concat(lit("payload-payload-payload-"), col("id")).as("v"))
    def dim = spark.range(30000).select(
      (col("id") % 64).as("k"), (col("id") * 3).as("w"))

    def run(aqe: Boolean): (Long, Seq[SparkPlan]) = withConf(
      "spark.sql.adaptive.enabled" -> aqe.toString,
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // sum(length(v)) keeps the fat payload column alive through column
      // pruning — otherwise the shuffle carries bare longs and the hot
      // partition never crosses the (lowered) skew threshold
      val joined = fact.join(dim, "k")
        .select(sum(col("w")).as("s"), count(lit(1)).as("n"),
          sum(length(col("v"))).as("b"))
      val row = joined.collect()(0)
      (row.getLong(1), flatten(joined.queryExecution.executedPlan))
    }

    val (nOff, _) = run(aqe = false)
    val (nOn, nodes) = run(aqe = true)
    assert(nOn == nOff, "AQE skew split must not change join results")
    val smj = nodes.collect { case j: SortMergeJoinExec => j }
    val skewReads = nodes.collect {
      case r: AQEShuffleReadExec if r.hasSkewedPartition => r }
    assert(smj.exists(_.isSkewJoin) && skewReads.nonEmpty,
      s"expected a skew-split sort-merge join; smj=${smj.map(_.isSkewJoin)}, " +
        s"skewReads=${skewReads.size}")
  }
}
