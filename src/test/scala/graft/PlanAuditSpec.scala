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

  test("no registry query plans an unpartitioned window outside the audited exceptions") {
    // A Window with no PARTITION BY moves the whole input to ONE partition
    // — a scale-killer unless the input is provably small. Two benign
    // shapes are recognized:
    //  - the window's input subtree is bounded by a limit
    //    (TakeOrderedAndProject / GlobalLimit): the top-k-then-rank
    //    pattern, window input <= k rows;
    //  - the explicitly audited two-phase prefix sums (graft.scale.Prefix),
    //    where the global window runs over exactly one pre-aggregated row
    //    per partition.
    val allowed = Set("q_seq_pack", "q_pack_shards", "q_vocab_growth")
    import org.apache.spark.sql.execution.{GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def boundedByLimit(p: SparkPlan): Boolean = p match {
      case _: TakeOrderedAndProjectExec | _: GlobalLimitExec => true
      case a: AdaptiveSparkPlanExec => boundedByLimit(a.inputPlan)
      // bounded only if EVERY input path is bounded: a join/union of a
      // limited side with an unbounded side is itself unbounded (leaves —
      // scans — have no children and are unbounded)
      case other => other.children.nonEmpty && other.children.forall(boundedByLimit)
    }
    def unboundedGlobalWindows(p: SparkPlan): Int = {
      val self = p match {
        case w: WindowExec if w.partitionSpec.isEmpty && !boundedByLimit(w.child) => 1
        case _ => 0
      }
      val nested = p match {
        case a: AdaptiveSparkPlanExec => unboundedGlobalWindows(a.inputPlan)
        case other => other.children.map(unboundedGlobalWindows).sum
      }
      self + nested
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (allowed(name)) None
      else {
        val n = unboundedGlobalWindows(fn(spark, sfDir).queryExecution.executedPlan)
        if (n > 0) Some(name) else None
      }
    }
    assert(offenders.isEmpty, s"unbounded global windows in: ${offenders.mkString(", ")}")
  }

  test("every BroadcastNestedLoopJoin broadcasts a provably small side") {
    // BNLJ replicates its broadcast side against EVERY row of the other
    // side — acceptable only when the broadcast side is dimension-sized
    // (ANN query panels, k centroids, seed rows). Execute each registry
    // query and assert every BNLJ's broadcast input stayed under a row
    // bound; an accidental corpus-sided BNLJ (e.g. a crossJoin that
    // should have been an equi-join) fails loudly. The bound is row-based
    // because at audit scale every table is small in BYTES — row count is
    // the shape signal that survives scale-down.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val maxBroadcastRows = 128L
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case s: QueryStageExec => flatten(s.plan)
      case other => other.children.flatMap(flatten)
    })
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val qe = fn(spark, sfDir).queryExecution
      qe.toRdd.count() // execute so broadcast metrics are populated
      val plan = qe.executedPlan
      flatten(plan).collect { case b: BroadcastNestedLoopJoinExec =>
        val buildChild = b.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
          case org.apache.spark.sql.catalyst.optimizer.BuildRight => b.right
        }
        flatten(buildChild).collect { case ex: BroadcastExchangeExec =>
          ex.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
        }
      }.flatten.filter(rows => rows < 0 || rows > maxBroadcastRows)
        .map(rows => s"$name(broadcastRows=$rows)")
    }
    assert(offenders.isEmpty,
      s"BNLJ with a non-dimension-sized broadcast side in: ${offenders.mkString(", ")}")
  }

  test("no registry query falls back to SortAggregate outside the audited exceptions") {
    // SortAggregateExec sorts its whole input by the grouping key on BOTH
    // sides of the aggregation's exchange — at fact scale two corpus
    // sorts (plus partial-side spill surface) where a hash aggregate does
    // O(1) buffer updates. Spark falls back whenever any aggregation
    // buffer type is UnsafeRow-immutable (structs, arrays, strings), so
    // an innocent-looking max(struct)/first(array) silently buys the sort
    // plan — the regression ArgMaxRow and the kernel-projection
    // assignments (Summary.onePass, Clustering.assign, ivfTopKWith)
    // removed. Allowed exceptions are aggregations whose sort fallback is
    // inherent AND whose input is bounded by contract (see each entry).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.SortAggregateExec
    // No exceptions left: the last one (q_scd_merge's string-payload
    // latest-per-key) now aggregates through ArgMaxRowAny's object
    // buffer (ObjectHashAggregateExec) instead of sort-falling-back.
    val allowed = Set.empty[String]
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.inputPlan)
      case other => other.children.flatMap(flatten)
    })
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (allowed(name)) None
      else {
        val n = flatten(fn(spark, sfDir).queryExecution.executedPlan)
          .count(_.isInstanceOf[SortAggregateExec])
        if (n > 0) Some(s"$name($n)") else None
      }
    }
    assert(offenders.isEmpty, s"SortAggregate fallbacks in: ${offenders.mkString(", ")}")
  }

  test("dupSpans: the span merge adds no exchange after its doc-partitioned window") {
    // Dedup.dupSpans claims its gaps-and-islands merge costs ONE window
    // partitioned by doc_id, with both downstream aggregations reusing the
    // window's hash(doc_id) partitioning — i.e. above the WindowExec sit
    // the four HashAggregates (two partial/final pairs) and the final
    // universe join, but NO further ShuffleExchange on the span path.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    val df = graft.llm.Dedup.dupSpans(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
    def root(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case other => other
    }
    val plan = root(df.queryExecution.executedPlan)
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(flatten)
    val windows = flatten(plan).collect { case w: WindowExec => w }
    assert(windows.size == 1, s"expected exactly one window, got ${windows.size}")
    assert(windows.head.partitionSpec.nonEmpty, "span window must be doc-partitioned")
    // path from the root to the window: the post-window span path
    def pathTo(p: SparkPlan): Option[Seq[SparkPlan]] = p match {
      case w: WindowExec => Some(Seq(w))
      case other => other.children.flatMap(pathTo).headOption.map(other +: _)
    }
    val path = pathTo(plan).getOrElse(fail("window not reachable"))
    val shufflesAbove = path.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(shufflesAbove == 0,
      s"span path re-shuffles after the window: ${path.map(_.nodeName).mkString(" <- ")}")
  }

  test("every query with an oracle is registered, and the flagship runs") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle SQL without a query: ${missing.mkString(", ")}")
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
