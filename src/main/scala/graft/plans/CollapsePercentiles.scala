package graft.plans

import graft.functions.FiveNumberSummary
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Max, Min, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import scala.collection.mutable

/** Optimizer rule: collapse a five-number-summary-shaped aggregation —
  * two or more exact `percentile(x, 0.25/0.5/0.75)` calls (plus any
  * `min(x)` / `max(x)`) over the SAME double column — into ONE
  * [[FiveNumberSummary]] buffer, with the original output columns rebuilt
  * as struct-field reads in a `Project` above the aggregate.
  *
  * Why a rule and not just the `ExactOnePass` operator mode: the operator
  * covers graft's own pipeline, but any ad-hoc `spark.sql("SELECT
  * percentile(v,.25), percentile(v,.5), percentile(v,.75) ... GROUP BY
  * ...")` still buffers every group's values once PER percentile — three
  * independent counts-maps of the whole group, the dominant memory term
  * of exact-quantile aggregation. The rewrite is a pure plan transform
  * (bit-identical results — FiveNumberSummary replicates Percentile's
  * interpolation arithmetic, pinned by FiveNumberSummarySpec), so it
  * belongs in the optimizer where EVERY query benefits.
  *
  * Deliberately conservative: fires only on the DataFrame/SQL
  * `groupBy().agg()` shape (each output is a grouping attribute or an
  * aliased aggregate-bearing expression), only on complete, unfiltered,
  * non-distinct aggregates of a DoubleType child, and only when at least
  * two of the three quartiles are present (min/max fold in for free —
  * the summary's sort yields them anyway). Anything else passes through
  * untouched.
  *
  * Install: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (constructor injection) or `spark.experimental.extraOptimizations`
  * on a live session.
  */
object CollapsePercentiles extends Rule[LogicalPlan] {

  /** Struct-field index in [[FiveNumberSummary.OutputType]] per kind. */
  private val FieldIdx = Map("min" -> 0, "q1" -> 1, "median" -> 2, "q3" -> 3, "max" -> 4)
  private val QKind = Map(0.25 -> "q1", 0.5 -> "median", 0.75 -> "q3")

  /** (child, kind) when `ae` is a foldable five-number member. */
  private def memberOf(ae: AggregateExpression): Option[(Expression, String)] =
    if (ae.isDistinct || ae.filter.nonEmpty) None
    else ae.aggregateFunction match {
      case p: Percentile if p.child.dataType == DoubleType =>
        (p.percentageExpression, p.frequencyExpression) match {
          case (Literal(pct: Double, DoubleType), Literal(1L, _)) =>
            QKind.get(pct).map(k => (p.child, k))
          case _ => None
        }
      case Min(c) if c.dataType == DoubleType => Some((c, "min"))
      case Max(c) if c.dataType == DoubleType => Some((c, "max"))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate if shouldRewrite(agg) => rewrite(agg)
  }

  /** Children with >= 2 distinct quartile kinds among the aggregate
    * expressions (keyed by canonicalized child). */
  private def foldableChildren(agg: Aggregate): Map[Expression, Expression] = {
    val kinds = mutable.Map.empty[Expression, (Expression, mutable.Set[String])]
    agg.aggregateExpressions.foreach(_.foreach {
      case ae: AggregateExpression => memberOf(ae).foreach { case (c, k) =>
        kinds.getOrElseUpdate(c.canonicalized, (c, mutable.Set.empty))._2 += k
      }
      case _ => ()
    })
    kinds.collect {
      case (canon, (c, ks)) if ks.count(k => k == "q1" || k == "median" || k == "q3") >= 2 =>
        canon -> c
    }.toMap
  }

  /** Grouping expressions that are plain attributes — what the inner
    * Aggregate can re-expose for the outer Project to reference. */
  private def groupingAttrs(agg: Aggregate): Seq[AttributeReference] =
    agg.groupingExpressions.collect { case a: AttributeReference => a }.distinct

  /** Attributes referenced OUTSIDE any aggregate function in the output
    * list (e.g. the `g` in `percentile(v, 0.25) + g AS x`). These must
    * survive into the rebuilt Aggregate's output or the outer Project
    * fails to bind. */
  private def nonAggRefs(agg: Aggregate): AttributeSet = {
    val refs = mutable.ArrayBuffer.empty[Attribute]
    def walk(e: Expression): Unit = e match {
      case _: AggregateExpression => ()
      case a: AttributeReference => refs += a
      case other => other.children.foreach(walk)
    }
    agg.aggregateExpressions.foreach(walk)
    AttributeSet(refs.toSeq)
  }

  private def shouldRewrite(agg: Aggregate): Boolean =
    foldableChildren(agg).nonEmpty && agg.aggregateExpressions.forall {
      case _: AttributeReference => true // grouping column passthrough
      case a: Alias => a.child.exists(_.isInstanceOf[AggregateExpression])
      case _ => false
    } &&
      // every attribute used outside an aggregate (top-level passthrough
      // OR buried inside an aliased expression) must be a grouping
      // attribute the inner Aggregate can re-emit; otherwise bail out
      nonAggRefs(agg).subsetOf(AttributeSet(groupingAttrs(agg)))

  private def rewrite(agg: Aggregate): LogicalPlan = {
    val folded = foldableChildren(agg)
    // one FiveNumberSummary per folded child
    val fiveAliases: Map[Expression, Alias] = folded.map { case (canon, c) =>
      canon -> Alias(FiveNumberSummary(c).toAggregateExpression(), "_graft_five")()
    }
    // every non-folded aggregate gets its own inner alias (dedup by canon)
    val passAliases = mutable.LinkedHashMap.empty[Expression, Alias]
    agg.aggregateExpressions.foreach(_.foreach {
      case ae: AggregateExpression if memberOf(ae).forall(m => !folded.contains(m._1.canonicalized)) =>
        passAliases.getOrElseUpdate(ae.canonicalized, Alias(ae, "_graft_agg")())
      case _ => ()
    })
    // re-emit ALL attribute-shaped grouping keys, not just those that
    // appear as top-level passthroughs: an alias like
    // `percentile(v, 0.25) + g` references `g` from the outer Project
    val inner = Aggregate(
      agg.groupingExpressions,
      (groupingAttrs(agg): Seq[NamedExpression]) ++ passAliases.values ++ fiveAliases.values,
      agg.child)
    val projectList: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference => a
      case a: Alias =>
        val rebuilt = a.child.transform {
          case ae: AggregateExpression =>
            memberOf(ae).filter(m => folded.contains(m._1.canonicalized)) match {
              case Some((c, kind)) =>
                GetStructField(fiveAliases(c.canonicalized).toAttribute, FieldIdx(kind), Some(kind))
              case None => passAliases(ae.canonicalized).toAttribute
            }
        }
        Alias(rebuilt, a.name)(exprId = a.exprId, qualifier = a.qualifier,
          explicitMetadata = Some(a.metadata))
    }
    Project(projectList, inner)
  }
}
