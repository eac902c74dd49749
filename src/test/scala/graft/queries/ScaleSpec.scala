package graft.queries

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.SparkSpec

class ScaleSpec extends SparkSpec {

  test("bucketed join runs with zero exchanges below the join") {
    // AQE re-plans lazily; turn it off in a sibling session so the static
    // physical plan is directly inspectable.
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val df = graft.SparkEntry.queries("b_bucketed_join")(s, sf)
    val plan = df.queryExecution.executedPlan
    val smjs = plan.collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, s"expected a sort-merge join:\n$plan")
    val exchangesBelowJoin = smjs.head.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchangesBelowJoin.isEmpty,
      s"bucketed join must not shuffle its inputs:\n${smjs.head}")
  }

  test("bucketed join result matches the plain-join answer") {
    val expected = graft.tbl(spark, sf, "lineitem")
      .join(graft.tbl(spark, sf, "orders"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .count()
    val viaBuckets = graft.SparkEntry.queries("b_bucketed_join")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(viaBuckets === expected)
  }

  test("GraftExtensions registers wkt_centroid_* for SQL use") {
    val r = spark.sql(
      "SELECT wkt_centroid_lng('POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))') AS x," +
        " wkt_centroid_lat('POINT(3 4)') AS y").head()
    assert(r.getDouble(0) === 0.5)
    assert(r.getDouble(1) === 4.0)
  }
}
