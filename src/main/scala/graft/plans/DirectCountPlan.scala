package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeSet, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.aggregate.HashAggregateExec

/** Single-phase `GROUP BY keys → count(*)` — the skip-partial-aggregation
  * operator OSS Spark lacks.
  *
  * Spark always plans `groupBy(k).count()` as partial → shuffle → final.
  * The map-side partial pays a per-partition hash-table build over every
  * input row to earn shuffle reduction — which is the right trade except
  * when the keys are NEAR-UNIQUE. This engine has two such hot paths,
  * both measured (PLANS.md round 6): the route aggregate of
  * `q_topk_popularity` (98.5% distinct (part,supp) pairs at sf1) and the
  * co-occurrence pair aggregate of `x_containment_pairs` (89% distinct
  * (a,b) pairs, average group size 1.12). There the partial pass reduces
  * the shuffle by ~1–11% while hashing 6–25 M rows for nothing, and OSS
  * 4.1.2 ships no skip-partial knob (conf registry checked round 6).
  *
  * This node plans to Spark's OWN [[HashAggregateExec]] in **Complete**
  * mode with a required child distribution on the keys: EnsureRequirements
  * inserts the one key shuffle, and the single post-shuffle hash aggregate
  * counts each group exactly once. Correctness, whole-stage codegen, and
  * the sort-based spill fallback are all inherited from the stock
  * operator — only the two-phase split is skipped.
  *
  * Scale: identical shuffle volume to the partial plan on near-unique
  * keys (there was nothing to combine), minus one full hash pass over the
  * input. Per-partition final-agg memory is distinct-keys/partitions, the
  * same as the stock final phase; skew keys still split under AQE. For
  * LOW-cardinality keys the stock partial plan is strictly better — this
  * operator is an explicit opt-in for the near-unique regime, not a
  * replacement default.
  */
final case class DirectCount(
    keys: Seq[Attribute],
    countAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {

  override def output: Seq[Attribute] = keys :+ countAttr

  // the count column is generated here; the keys are consumed from child
  override def producedAttributes: AttributeSet = AttributeSet(countAttr)

  override protected def withNewChildInternal(c: LogicalPlan): DirectCount =
    copy(child = c)
}

/** Plans [[DirectCount]] → Complete-mode [[HashAggregateExec]]. */
object DirectCountStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case DirectCount(keys, cnt, child) =>
      val aggExpr =
        AggregateExpression(Count(Literal(1)), Complete, isDistinct = false)
      val result: Seq[NamedExpression] =
        keys :+ Alias(aggExpr.resultAttribute, cnt.name)(exprId = cnt.exprId)
      HashAggregateExec(
        requiredChildDistributionExpressions = Some(keys),
        isStreaming = false,
        numShufflePartitions = None,
        groupingExpressions = keys,
        aggregateExpressions = Seq(aggExpr),
        aggregateAttributes = Seq(aggExpr.resultAttribute),
        initialInputBufferOffset = 0,
        resultExpressions = result,
        child = planLater(child)) :: Nil
    case _ => Nil
  }
}
