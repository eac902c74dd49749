package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.DirectAgg

/** Semantics + plan shape for the skip-partial aggregate operator. */
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

  test("general aggregates (min/sum/count) match the stock plan") {
    val df = (0 until 4000)
      .map(i => (s"f${i % 1900}", i.toLong, (i % 13).toLong))
      .toDF("fp", "id", "w")
    val got = DirectAgg.aggByKeys(df, Seq("fp"),
      min(col("id")).as("keeper"), sum(col("w")).as("tw"),
      count(lit(1)).as("n"))
      .as[(String, Long, Long, Long)].collect().toSet
    val want = df.groupBy("fp").agg(min(col("id")).as("keeper"),
      sum(col("w")).as("tw"), count(lit(1)).as("n"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("distinctByKeys matches distinct()") {
    val df = (0 until 3000).map(i => (i % 1100, i % 7)).toDF("a", "b")
    val got = DirectAgg.distinctByKeys(df).as[(Int, Int)].collect().toSet
    val want = df.distinct().as[(Int, Int)].collect().toSet
    assert(got === want)
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

  test("count column name collision is rejected") {
    val df = Seq((1, 2)).toDF("a", "n")
    intercept[IllegalArgumentException] {
      DirectAgg.countByKeys(df, "n")
    }
  }

  test("unsupported shapes fall back to the stock two-phase plan, correctly") {
    val df = (0 until 100).map(i => (i % 10, i % 4)).toDF("a", "n")
    // DISTINCT aggregate: single-phase path must decline, results stock
    val d = DirectAgg.aggByKeys(df, Seq("a"), count_distinct(col("n")).as("d"))
    assert(d.as[(Int, Long)].collect().toSet ===
      df.groupBy("a").agg(count_distinct(col("n")).as("d"))
        .as[(Int, Long)].collect().toSet)
    // non-mutable buffer (collect_list): same fallback
    val l = DirectAgg.aggByKeys(df, Seq("a"),
      size(collect_list(col("n"))).as("sz"))
    assert(l.as[(Int, Int)].collect().toSet ===
      df.groupBy("a").agg(size(collect_list(col("n"))).as("sz"))
        .as[(Int, Int)].collect().toSet)
  }

  test("reused branches (self-join over the aggregate) stay consistent") {
    // the exact shape that broke the opaque-holder design: the counted
    // frame feeds two branches that the analyzer dedups independently
    val df = (0 until 400).map(i => (i % 150, i)).toDF("k", "v")
    val d = DirectAgg.countByKeys(df.select("k"), "reps")
    val keeper = d.groupBy("reps").agg(min(col("k")).as("min_k"))
    val joined = d.join(keeper, "reps").filter(col("k") === col("min_k"))
    assert(joined.count() === d.select("reps").distinct().count())
  }

  test("downstream operators compose over the counted output") {
    val df = (0 until 300).map(i => (i % 100).toLong).toDF("g")
    val top = DirectAgg.countByKeys(df, "n")
      .filter(col("g") < 50).orderBy(col("g")).limit(5)
      .as[(Long, Long)].collect().toSeq
    assert(top === (0L until 5L).map(g => (g, 3L)))
  }
}

/** SQL-surface form of the skip-partial knob. */
class SkipPartialHintSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("SELECT /*+ SKIP_PARTIAL_AGG */ plans one agg phase, correct rows") {
    (0 until 900).map(i => (i % 700, i)).toDF("k", "v")
      .createOrReplaceTempView("skip_hint_t")
    val df = spark.sql(
      "SELECT /*+ SKIP_PARTIAL_AGG */ k, count(*) AS n, min(v) AS mn " +
        "FROM skip_hint_t GROUP BY k")
    df.write.format("noop").mode("overwrite").save()
    val aggs = collectWithSubqueries(df.queryExecution.executedPlan) {
      case h: HashAggregateExec => h
    }
    assert(aggs.length === 1, s"hint must skip the partial phase:\n" +
      df.queryExecution.executedPlan)
    val want = spark.sql(
      "SELECT k, count(*) AS n, min(v) AS mn FROM skip_hint_t GROUP BY k")
      .as[(Int, Long, Int)].collect().toSet
    assert(df.as[(Int, Long, Int)].collect().toSet === want)
  }

  test("hinted GLOBAL aggregate keeps the stock two-phase plan (no " +
    "all-tuples shuffle of the raw input)") {
    (0 until 5000).map(i => (i % 7, i.toLong)).toDF("k", "v")
      .createOrReplaceTempView("skip_hint_g")
    val df = spark.sql(
      "SELECT /*+ SKIP_PARTIAL_AGG */ count(*) AS n, sum(v) AS s " +
        "FROM skip_hint_g")
    df.write.format("noop").mode("overwrite").save()
    val exec = df.queryExecution.executedPlan
    // two phases = partial reduction happened before the single-partition
    // exchange; the single-phase cliff would show exactly one
    val aggs = collectWithSubqueries(exec) { case h: HashAggregateExec => h }
    assert(aggs.length === 2, s"global agg must stay two-phase:\n$exec")
    assert(df.as[(Long, Long)].collect().toSeq ===
      Seq((5000L, (0 until 5000).map(_.toLong).sum)))
  }

  test("hint on an unsupported aggregate degrades to the stock plan") {
    Seq((1, 2), (1, 3), (2, 2)).toDF("k", "v")
      .createOrReplaceTempView("skip_hint_u")
    val df = spark.sql(
      "SELECT /*+ SKIP_PARTIAL_AGG */ k, count(DISTINCT v) AS d " +
        "FROM skip_hint_u GROUP BY k")
    assert(df.as[(Int, Long)].collect().toSet === Set((1, 2L), (2, 1L)))
  }
}
