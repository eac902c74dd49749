package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.planning.PhysicalAggregation
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, AggregateHint, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.aggregate.HashAggregateExec

/** Single-phase hash aggregation — the skip-partial-aggregation knob OSS
  * Spark lacks.
  *
  * Spark always plans `groupBy(k).agg(…)` as partial → shuffle → final.
  * The map-side partial pays a per-partition hash-table build over every
  * input row to earn shuffle reduction — the right trade except when the
  * grouping keys are NEAR-UNIQUE. This engine has several such hot paths,
  * all measured (PLANS.md rounds 6–7): the route aggregate of
  * `q_topk_popularity` (98.5% distinct (part,supp) pairs at sf1; 6.2 s →
  * 2.0 s isolated), the co-occurrence pair aggregate of
  * `x_containment_pairs` (89% distinct, average group 1.12), the LSH
  * candidate-pair `distinct()` of `x_minhash_lsh_pairs` (cross-band
  * duplicates land in different partitions, so the partial can never
  * merge them), and exact-dedup fingerprint groups. There the partial
  * pass reduces the shuffle by 1–11% while hashing the full stream for
  * nothing, and OSS 4.1.2 ships no skip-partial knob (conf registry
  * checked round 6).
  *
  * Mechanism: `graft.ops.DirectAgg` tags the ANALYZED stock
  * [[Aggregate]] with [[SkipPartialAggHint]] (the `hint` slot logical
  * aggregates carry since Spark 4.x), so the plan stays a first-class
  * Aggregate through analysis and the whole optimizer — column pruning,
  * relation dedup, filter pushdown all see the stock node. At physical
  * planning this strategy (session extensions run before the built-in
  * strategies) intercepts the hinted node via the standard
  * [[PhysicalAggregation]] extractor and emits ONE Complete-mode
  * [[HashAggregateExec]] with a required child distribution on the keys:
  * EnsureRequirements inserts the single key shuffle and each group is
  * evaluated exactly once post-shuffle. Correctness, whole-stage codegen,
  * and the sort-based spill fallback are all inherited from the stock
  * operator — only the two-phase split is skipped.
  *
  * Falls back to the stock planner (returns Nil) for anything the
  * single-phase hash path cannot honor: DISTINCT or FILTER aggregate
  * forms, non-mutable aggregation buffers (collect_list & co), or an
  * EMPTY grouping list (global aggregates — single-phase would mean
  * shuffling every raw row to one partition).
  *
  * Scale: identical shuffle volume to the partial plan on near-unique
  * keys (there was nothing to combine), minus one full hash pass over the
  * input. Per-partition memory is distinct-keys/partitions — the same as
  * the stock final phase (note AQE's skew mitigation only splits
  * join/rebalance shuffles, so a skewed key feeding the final aggregate
  * is not split in EITHER plan — parity, not an extra risk). For
  * LOW-cardinality keys the stock partial plan is strictly better — the
  * hint is an explicit opt-in for the near-unique regime, not a
  * replacement default.
  */
case object SkipPartialAggHint extends AggregateHint {
  override def toString: String = "SKIP_PARTIAL_AGG"
}

/** Plans [[SkipPartialAggHint]]-tagged aggregates → Complete-mode
  * [[HashAggregateExec]]. */
object DirectAggStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case agg: Aggregate if agg.hint.contains(SkipPartialAggHint) =>
      plan match {
        case PhysicalAggregation(grouping, aggExprs, result, child)
            // grouping.nonEmpty: a GLOBAL aggregate with
            // requiredChildDistributionExpressions = Some(Nil) would demand
            // AllTuples — EnsureRequirements would funnel the ENTIRE raw
            // input to one partition with no partial reduction. Correct but
            // an OOM/perf cliff; the stock two-phase plan is strictly better
            // there, so empty grouping falls through.
            if grouping.nonEmpty &&
              aggExprs.forall(ae => !ae.isDistinct && ae.filter.isEmpty &&
              ae.mode == Complete) &&
              aggExprs.flatMap(_.aggregateFunction.aggBufferAttributes)
                .forall(a => UnsafeRow.isMutable(a.dataType)) =>
          // same grouping-key floating-point normalization as the stock
          // Aggregation strategy (-0.0 ≡ 0.0, NaN canonicalization)
          val normalizedGrouping: Seq[NamedExpression] = grouping.map { e =>
            org.apache.spark.sql.GraftBridge.normalizeFloat(e) match {
              case n: NamedExpression => n
              case other => Alias(other, e.name)(exprId = e.exprId)
            }
          }
          HashAggregateExec(
            requiredChildDistributionExpressions =
              Some(normalizedGrouping.map(_.toAttribute)),
            isStreaming = false,
            numShufflePartitions = None,
            groupingExpressions = normalizedGrouping,
            aggregateExpressions = aggExprs,
            aggregateAttributes = aggExprs.map(_.resultAttribute),
            initialInputBufferOffset = 0,
            resultExpressions = result,
            child = planLater(child)) :: Nil
        case _ => Nil // stock two-phase planner handles it
      }
    case _ => Nil
  }
}
