package graft.queries

import graft.SparkSpec

/** Structural invariants of the event-analytics reshapes that the oracle
  * hash-compare can't express: funnel monotonicity and retention-matrix
  * day-0 completeness. */
class TemporalFunnelSpec extends SparkSpec {

  test("funnel stages are monotonically non-increasing") {
    val rows = graft.SparkEntry.queries("x_funnel")(spark, sf)
      .orderBy("stage_ord").collect()
    assert(rows.map(_.getString(1)).toSeq ===
      Seq("view", "click", "purchase"))
    val ns = rows.map(_.getLong(2)).toSeq
    assert(ns === ns.sorted.reverse,
      s"funnel must shrink stage-over-stage: $ns")
    assert(ns.head > 0, "no user ever viewed — fixture broken?")
  }

  test("retention: day-0 cohort sizes cover every signup cohort") {
    import org.apache.spark.sql.functions._
    val ret = graft.SparkEntry.queries("x_retention")(spark, sf)
    // every cohort day has a day-0 row (a user is active on their own
    // signup day by definition of the signup event)
    val cohorts = ret.select("cohort_day").distinct().count()
    val day0 = ret.filter(col("day_offset") === 0).count()
    assert(day0 === cohorts)
    // offsets stay within the documented cap
    assert(ret.filter(col("day_offset") < 0 || col("day_offset") > 13)
      .count() === 0)
  }
}
