package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** SQL surface for the skip-partial knob:
  *
  * {{{ SELECT /*+ SKIP_PARTIAL_AGG */ k, count(*) FROM t GROUP BY k }}}
  *
  * Rewrites the `UnresolvedHint` into [[SkipPartialAggHint]] tags on the
  * aggregates in the hinted scope. The scope is the operator tree below
  * the hint — aggregates nested inside scalar/IN subquery EXPRESSIONS are
  * NOT tagged (`transformUp` does not descend into SubqueryExpression
  * plans); hint inside the subquery text itself to reach those. Runs from
  * the injected resolution rules, i.e. before the analyzer's trailing
  * remove-unresolved-hints pass warns on and strips unknown hints.
  * Aggregates the single-phase path cannot honor still fall back at
  * planning ([[DirectAggStrategy]]), so a misplaced hint degrades to the
  * stock plan, never to an error.
  */
object SkipPartialHintRule extends Rule[LogicalPlan] {
  private val Name = "SKIP_PARTIAL_AGG"

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case UnresolvedHint(name, Nil, child) if name.equalsIgnoreCase(Name) =>
        child.transformUp {
          case a: Aggregate if a.hint.isEmpty && a.groupingExpressions.nonEmpty =>
            // empty grouping skipped: single-phase on a global aggregate
            // would shuffle all raw rows to one partition (see
            // DirectAggStrategy guard — defense in both layers)
            a.copy(hint = Some(SkipPartialAggHint))
        }
    }
}
