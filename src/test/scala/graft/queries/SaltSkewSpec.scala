package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hot-key stress for the salted join: a fixture where ~80% of events hit
  * ONE zone (the skew shape AQE's skew-join thresholds exist for), checked
  * two ways: (1) semantics — the salted plan returns exactly the plain
  * join's answer on the skewed data; (2) mechanics — after salting, the
  * hot key's rows are spread across SaltF shuffle keys with no shuffle key
  * holding more than 2/SaltF of the total, whereas unsalted the hot key
  * alone holds ~80%. */
class SaltSkewSpec extends SparkSpec {

  private val HotZone = 17L

  // ~80% of events forced onto one zone, rest spread over the other 24
  private def skewedEvents = graft.eventsTbl(spark, sf)
    .select(col("event_id"),
      when(col("event_id") % 5 < 4, lit(HotZone))
        .otherwise(col("user_id") % 25).as("zone_id"),
      col("value"))

  test("salted join preserves plain-join semantics under 80/20 skew") {
    val dim = graft.tbl(spark, sf, "nation")
    val salted = ScaleQueries.saltedZoneJoin(skewedEvents, dim)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = skewedEvents
      .join(dim, col("zone_id") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .orderBy("n_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted === plain)
  }

  test("salting splits the hot key below 2/SaltF of total reducer load") {
    val total = skewedEvents.count().toDouble
    // unsalted shuffle key = zone_id: the hot zone dominates
    val unsaltedMax = skewedEvents.groupBy("zone_id").count()
      .agg(max("count")).head().getLong(0).toDouble
    assert(unsaltedMax / total > 0.5,
      s"fixture not skewed enough: hot share ${unsaltedMax / total}")
    // salted shuffle key = (zone_id, salt): load spreads across SaltF keys
    val saltedMax = skewedEvents
      .withColumn("salt", pmod(col("event_id"), lit(ScaleQueries.SaltF)))
      .groupBy("zone_id", "salt").count()
      .agg(max("count")).head().getLong(0).toDouble
    assert(saltedMax / total < 2.0 / ScaleQueries.SaltF,
      s"salted max share ${saltedMax / total} >= 2/${ScaleQueries.SaltF}")
    // and the hot key genuinely occupies SaltF distinct shuffle keys
    val hotKeys = skewedEvents.filter(col("zone_id") === HotZone)
      .select(pmod(col("event_id"), lit(ScaleQueries.SaltF)))
      .distinct().count()
    assert(hotKeys === ScaleQueries.SaltF)
  }
}
