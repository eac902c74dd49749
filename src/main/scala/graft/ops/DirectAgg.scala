package graft.ops

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.types.LongType

import graft.plans.{DirectCount, DirectCountStrategy}

/** Public API over the single-phase [[graft.plans.DirectCount]] aggregate:
  * `GROUP BY <all columns> → count(*)` with NO map-side partial pass.
  *
  * {{{
  * DirectAgg.countByKeys(lineitem.select("l_partkey", "l_suppkey"),
  *                       "route_count")
  * }}}
  *
  * Use when the grouping keys are near-unique (see the operator scaladoc
  * for when the stock partial plan wins instead).
  */
object DirectAgg {

  /** Idempotently make the planner aware of [[DirectCount]] on this
    * session (same per-session hook as [[AsOf.install]]). */
  def install(spark: SparkSession): Unit = synchronized {
    val already = spark.sessionState.planner.strategies
      .contains(DirectCountStrategy)
    if (!already)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ DirectCountStrategy
  }

  /** `df.groupBy(<every column of df>).agg(count(*) as countName)`, planned
    * as one shuffle + one Complete-mode hash aggregate. Project the key
    * columns before calling. */
  def countByKeys(df: DataFrame, countName: String): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val child = df.queryExecution.analyzed
    require(child.output.nonEmpty, "countByKeys needs at least one key column")
    require(!child.output.exists(_.name == countName),
      s"count column '$countName' collides with a key column")
    val cnt = AttributeReference(countName, LongType, nullable = false)()
    GraftBridge.ofRows(spark, DirectCount(child.output, cnt, child))
  }
}
