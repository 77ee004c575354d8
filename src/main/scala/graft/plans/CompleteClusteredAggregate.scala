package graft.plans

import org.apache.spark.sql.catalyst.expressions.NamedExpression
import org.apache.spark.sql.catalyst.expressions.aggregate.{Complete, Final, Partial}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{BaseAggregateExec, HashAggregateExec, ObjectHashAggregateExec}

/** Physical rewrite: collapse an adjacent partial→final aggregate pair
  * into ONE complete-mode aggregate when no exchange separates them.
  *
  * Spark always plans a `groupBy` as partial+final `HashAggregate`s and
  * lets `EnsureRequirements` put a shuffle between them. When the child's
  * partitioning already satisfies the grouping distribution — a scan that
  * reports `KeyGroupedPartitioning` ([[graft.sources.GribSource]]
  * `partitionByStep`), or a prior `repartition` on the grouping keys —
  * the exchange is elided but BOTH aggregation passes still run
  * back-to-back in the same stage: the partial pass builds a hash table
  * (or sorts, once past the object-agg fallback threshold) over every
  * input row, serializes each group's buffer ([[
  * graft.functions.FiveNumberSummary]] is a `TypedImperativeAggregate`,
  * so partial output is the serialized value buffer), and the final pass
  * immediately deserializes and re-aggregates the same groups. All of
  * that is pure overhead: with the distribution already satisfied, a
  * single complete-mode aggregate computes identical groups in one pass
  * with no buffer serialize/deserialize hop.
  *
  * On the full operational GloFAS day (985 M cells, 30 step-clustered
  * partitions × 644k (cell, step) groups) the two `ObjectHashAggregate`
  * passes are ~40 s of a 94 s pipeline (BASELINE.md round-12 profile);
  * this rewrite removes the redundant half.
  *
  * Fires only when every guard holds:
  *  - parent and child are the same aggregate exec class (hash / object
  *    hash), directly adjacent (adjacency after `EnsureRequirements` IS
  *    the planner's proof that no exchange was needed);
  *  - all parent modes are `Final`, all child modes are `Partial`, and
  *    they carry the same aggregate functions (matched by `resultId`);
  *  - no distinct aggregates (distinct planning uses 4 phases with
  *    different grouping — never this shape);
  *  - neither side is streaming (streaming aggs keep partial/final split
  *    around the state store);
  *  - belt-and-braces: the grandchild's `outputPartitioning` satisfies
  *    the final's required distribution (re-checks what adjacency
  *    implies, so a plan produced by some other rewrite can never merge
  *    incorrectly).
  *
  * Result columns, exprIds, and output partitioning are unchanged (the
  * merged node keeps the final's `resultExpressions` and
  * `requiredChildDistributionExpressions`), so parents above are
  * unaffected and the rewrite is idempotent — after merging, no
  * Partial→Final pair remains to match.
  *
  * Installed by [[graft.functions.GraftExtensions]] both as a query-stage
  * preparation rule (the AQE path — runs on the whole physical plan after
  * `EnsureRequirements`, before stage division) and as a
  * `ColumnarRule.preColumnarTransitions` (the non-AQE path, which applies
  * during query preparation; under AQE it re-runs per stage, where the
  * rewrite is a no-op on already-merged plans).
  */
object CompleteClusteredAggregate extends Rule[SparkPlan] {

  /** Runtime safety valve: `SET spark.graft.completeClusteredAgg.enabled
    * = false` turns the rewrite off without uninstalling the extension
    * (the usual escape hatch a cluster operator expects from an injected
    * physical rule). Default on. */
  val EnabledKey = "spark.graft.completeClusteredAgg.enabled"

  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "true").toBoolean

  private def sameAggregates(parent: BaseAggregateExec, child: BaseAggregateExec): Boolean =
    parent.aggregateExpressions.length == child.aggregateExpressions.length &&
      parent.aggregateExpressions.zip(child.aggregateExpressions).forall {
        case (f, p) => f.resultId == p.resultId
      }

  /** Grouping attributes flow through: the final's grouping expressions
    * must be exactly the attributes produced by the partial's grouping
    * expressions, in order. */
  private def groupingFlowsThrough(parent: BaseAggregateExec, child: BaseAggregateExec): Boolean = {
    val childGroupAttrs = child.groupingExpressions.map(_.toAttribute.exprId)
    // total, not a partial-function map: an exotic non-named grouping
    // expression must make the rule decline, not crash planning
    val parentGroupIds = parent.groupingExpressions.map {
      case ne: NamedExpression => Some(ne.exprId)
      case _ => None
    }
    parentGroupIds.forall(_.isDefined) && parentGroupIds.flatten == childGroupAttrs
  }

  private def mergeable(parent: BaseAggregateExec, child: BaseAggregateExec): Boolean =
    // a final agg always declares its distribution; None would make the
    // satisfies() check vacuous (UnspecifiedDistribution), so refuse it
    parent.requiredChildDistributionExpressions.isDefined &&
      parent.aggregateExpressions.forall(a => a.mode == Final && !a.isDistinct) &&
      child.aggregateExpressions.forall(a => a.mode == Partial && !a.isDistinct) &&
      sameAggregates(parent, child) &&
      groupingFlowsThrough(parent, child) &&
      child.child.outputPartitioning.satisfies(parent.requiredChildDistribution.head)

  override def apply(plan: SparkPlan): SparkPlan = if (!enabled) plan else plan.transformUp {
    case parent @ ObjectHashAggregateExec(reqDist, false, numShuf, _, finalExprs, aggAttrs, _, resExprs,
        child @ ObjectHashAggregateExec(_, false, _, groupExprs, _, _, _, _, grandchild))
        if mergeable(parent, child) =>
      ObjectHashAggregateExec(reqDist, isStreaming = false, numShuf, groupExprs,
        finalExprs.map(_.copy(mode = Complete)), aggAttrs,
        initialInputBufferOffset = 0, resExprs, grandchild)

    case parent @ HashAggregateExec(reqDist, false, numShuf, _, finalExprs, aggAttrs, _, resExprs,
        child @ HashAggregateExec(_, false, _, groupExprs, _, _, _, _, grandchild))
        if mergeable(parent, child) =>
      HashAggregateExec(reqDist, isStreaming = false, numShuf, groupExprs,
        finalExprs.map(_.copy(mode = Complete)), aggAttrs,
        initialInputBufferOffset = 0, resExprs, grandchild)
  }
}
