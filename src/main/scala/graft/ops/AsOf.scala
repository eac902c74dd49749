package graft.ops

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}

import graft.plans.{AsOfBackward, AsOfDirection, AsOfJoin, AsOfJoinStrategy}

/** Public as-of join API over the custom Catalyst operator
  * (graft.plans.AsOfJoin / AsOfJoinExec).
  *
  * {{{
  * AsOf.join(trades, quotes,
  *   leftKeys = Seq("symbol"), rightKeys = Seq("symbol"),
  *   leftTime = "trade_ts", rightTime = "quote_ts")
  * }}}
  *
  * Output schema = left columns ++ right columns (right side nullable);
  * callers disambiguate overlapping names by renaming beforehand, exactly
  * as with a plain `join` on expressions. Time columns must be
  * timestamp or long (µs comparison either way).
  */
object AsOf {

  /** Idempotently make the planner aware of [[AsOfJoin]] on this session.
    * `experimental.extraStrategies` is the public per-session hook, so the
    * operator works on ANY session — no `spark.sql.extensions` config
    * needed (GraftExtensions also registers it for sessions built through
    * GraftSession). */
  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** LEFT OUTER as-of join. `direction = AsOfBackward` (default): each
    * left row gains the right row with equal keys and the GREATEST
    * `rightTime` ≤ `leftTime`; `AsOfForward`: the SMALLEST `rightTime` ≥
    * `leftTime` (next-event attribution). Nulls when no such row.
    * Column names resolve by exact (case-sensitive) attribute name —
    * stricter than Spark's conf-aware resolution, by contract. */
  def join(left: DataFrame, right: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftTime: String, rightTime: String,
           direction: AsOfDirection = AsOfBackward): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"as-of column '$name' not in ${plan.output.map(_.name)}"))
    GraftBridge.ofRows(spark, AsOfJoin(
      lPlan, rPlan,
      leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
      attr(lPlan, leftTime), attr(rPlan, rightTime), direction))
  }
}
