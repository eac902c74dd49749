package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.DirectAgg

/** Semantics + plan shape for the skip-partial count operator. */
class DirectCountSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("counts match groupBy().count() exactly, including null keys") {
    val rows = (0 until 5000).map { i =>
      (if (i % 7 == 0) null else s"k${i % 1500}", (i % 11).toLong)
    }
    val df = rows.toDF("k", "v")
    val got = DirectAgg.countByKeys(df.select("k", "v"), "n")
      .as[(Option[String], Long, Long)].collect().toSet
    val want = df.groupBy("k", "v").agg(count(lit(1)).as("n"))
      .as[(Option[String], Long, Long)].collect().toSet
    assert(got === want)
    assert(got.toSeq.map(_._3).sum === 5000L)
  }

  test("plans ONE hash aggregate and ONE key shuffle — no partial phase") {
    val df = (0 until 1000).map(i => (i.toLong, i % 3)).toDF("a", "b")
    val counted = DirectAgg.countByKeys(df.select("a", "b"), "n")
    counted.write.format("noop").mode("overwrite").save()
    val exec = counted.queryExecution.executedPlan
    val aggs = collectWithSubqueries(exec) { case h: HashAggregateExec => h }
    assert(aggs.length === 1, s"want exactly one agg phase:\n$exec")
    val shuffles =
      collectWithSubqueries(exec) { case e: ShuffleExchangeLike => e }
    assert(shuffles.length === 1, s"want exactly one shuffle:\n$exec")
  }

  test("count column name collision and empty keys are rejected") {
    val df = Seq((1, 2)).toDF("a", "n")
    intercept[IllegalArgumentException] {
      DirectAgg.countByKeys(df, "n")
    }
  }

  test("downstream operators compose over the counted output") {
    val df = (0 until 300).map(i => (i % 100).toLong).toDF("g")
    val top = DirectAgg.countByKeys(df, "n")
      .filter(col("g") < 50).orderBy(col("g")).limit(5)
      .as[(Long, Long)].collect().toSeq
    assert(top === (0L until 5L).map(g => (g, 3L)))
  }
}
