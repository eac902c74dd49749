package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}

import graft.SparkSpec

/** The FIXTURES.md §A golden end-to-end test: a synthetic green-trips day
  * engineered to hit every documented edge of the reference's semantics —
  * each normalization reject reason alone, every daypart bucket plus the
  * no-ELSE NULL edge, duplicate 4-tuples (J3 row multiplication),
  * unmatched zone ids (LEFT-join NULL killed by finish_rank=1), rank
  * ties with a top-k cutoff (J4/W2 multiplication), and the
  * midnight-crossing negative drive_time (F9 trunc-toward-zero). */
class GoldenPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def mkTrips(rows: Seq[(Timestamp, Timestamp, java.lang.Long,
      java.lang.Double, Double, Double, Long, Long)]): DataFrame =
    rows.toDF("pickup_datetime", "dropoff_datetime", "passenger_count",
      "trip_distance", "fare_amount", "total_amount",
      "pickup_location_id", "dropoff_location_id")

  // -- A1 seed: good trips covering all dayparts + engineered route counts
  private val good: Seq[(Timestamp, Timestamp, java.lang.Long,
      java.lang.Double, Double, Double, Long, Long)] = Seq(
    // route 1→2 ×3 (top route), spread across dayparts
    (ts("2023-02-16 03:00:00"), ts("2023-02-16 03:20:00"), 1L, 2.0, 10.0, 12.0, 1L, 2L), // Night
    (ts("2023-02-16 08:00:00"), ts("2023-02-16 08:20:00"), 1L, 2.0, 10.0, 12.0, 1L, 2L), // Morning
    (ts("2023-02-16 13:00:00"), ts("2023-02-16 13:20:00"), 1L, 2.0, 10.0, 12.0, 1L, 2L), // Noon
    // routes 2→1 and 2→3: tied counts (×2 each) → RANK tie at popularity 2
    (ts("2023-02-16 19:00:00"), ts("2023-02-16 19:30:00"), 1L, 3.0, 12.0, 14.0, 2L, 1L), // Evening
    (ts("2023-02-16 20:00:00"), ts("2023-02-16 20:30:00"), 2L, 3.0, 12.0, 14.0, 2L, 1L),
    (ts("2023-02-16 21:00:00"), ts("2023-02-16 21:30:00"), 1L, 3.0, 12.0, 14.0, 2L, 3L),
    (ts("2023-02-16 22:00:00"), ts("2023-02-16 22:30:00"), 1L, 3.0, 12.0, 14.0, 2L, 3L),
    // the no-ELSE daypart edge: pickup in (23:59:59, 24:00) → NULL daypart
    (ts("2023-02-16 23:59:59.5"), ts("2023-02-17 00:15:00"), 1L, 1.5, 8.0, 9.0, 3L, 1L),
    // duplicate 4-tuple: same identity twice → J3 multiplies to 2×2=4 rows
    (ts("2023-02-16 15:00:00"), ts("2023-02-16 15:10:00"), 1L, 1.0, 6.0, 7.0, 3L, 2L),
    (ts("2023-02-16 15:00:00"), ts("2023-02-16 15:10:00"), 2L, 1.1, 6.5, 7.5, 3L, 2L),
    // unmatched zone id 99 → LEFT join NULL-extends, finish_rank=1 kills it
    (ts("2023-02-16 16:00:00"), ts("2023-02-16 16:30:00"), 1L, 2.0, 9.0, 10.0, 99L, 1L))

  // -- A1 seed: one row per normalization reject reason, alone
  private val bad: Seq[(Timestamp, Timestamp, java.lang.Long,
      java.lang.Double, Double, Double, Long, Long)] = Seq(
    (ts("2023-02-16 09:00:00"), ts("2023-02-16 09:00:00"), 1L, 1.0, 5.0, 6.0, 1L, 2L), // equal ts
    (ts("2023-02-16 09:10:00"), ts("2023-02-16 09:20:00"), 0L, 1.0, 5.0, 6.0, 1L, 2L), // 0 pax
    (ts("2023-02-16 09:30:00"), ts("2023-02-16 09:40:00"), null, 1.0, 5.0, 6.0, 1L, 2L), // NULL pax
    (ts("2023-02-16 09:50:00"), ts("2023-02-16 10:00:00"), 1L, 0.0, 5.0, 6.0, 1L, 2L), // 0 dist
    (ts("2023-02-16 10:10:00"), ts("2023-02-16 10:20:00"), 1L, null, 5.0, 6.0, 1L, 2L), // NULL dist
    (ts("2023-02-16 10:30:00"), ts("2023-02-16 10:40:00"), 1L, 1.0, 0.0, 0.0, 1L, 2L)) // 0 fare

  private lazy val trips = mkTrips(good ++ bad)

  // -- A2: zones with a duplicate zone_id of differing WKT byte length
  private lazy val zones = Seq(
    (1L, "Z1", "POLYGON((0 0, 0.5 0, 0.5 0.5, 0 0.5, 0 0))"),
    (1L, "Z1-dup", "POINT(0.25 0.25)"), // shorter WKT → deduped away (W1)
    (2L, "Z2", "POLYGON((1 1, 1.5 1, 1.5 1.5, 1 1.5, 1 1))"),
    (3L, "Z3", "MULTIPOLYGON(((2 2, 2.5 2, 2.5 2.5, 2 2.5, 2 2)))"))
    .toDF("zone_id", "zone_name", "zone_geom")

  private lazy val enriched =
    TaxiOps.enrich(TaxiOps.normalize(trips), zones)

  test("normalization: each reject reason alone is removed; keep/reject partition") {
    assert(TaxiOps.normalize(trips).count() === good.size)
    assert(TaxiOps.normalizeInverted(trips).count() === bad.size)
  }

  test("enrichment: daypart buckets + NULL edge; unmatched zone killed; J3 multiplies dup identities") {
    // 11 good trips: the zone-99 one dies at finish_rank=1; the duplicate
    // identity pair (2 rows) multiplies to 4 via the 4-key self-join
    assert(enriched.count() === 11 - 1 + 2)
    val parts = enriched.select("daypart").collect().map(r =>
      Option(r.getString(0)))
    assert(parts.count(_.isEmpty) === 1) // exactly the 23:59:59.5 pickup
    assert(Set("Night", "Morning", "Noon", "Evening")
      .subsetOf(parts.flatten.toSet))
    assert(enriched.filter($"hex_pickup".isNull || $"hex_dropoff".isNull)
      .count() === 0)
  }

  test("most populars: RANK ties share popularity and multiply via USING joins") {
    val mp = TaxiOps.mostPopulars(enriched, k = 10)
    val routeRows = mp.select("route.pickup_hexagons", "route.dropoff_hexagons",
      "route_count", "popularity").distinct().collect()
    // top route (1→2, count 3, but dup-identity route 3→2 has 4 rows) —
    // compute expectations from first principles instead:
    // route counts: 3→2:4, 1→2:3, 2→1:2, 2→3:2 → ranks 1,2,3,3
    val byCount = routeRows.map(r =>
      (r.getLong(2), r.getInt(3))).toSet
    assert(byCount === Set((4L, 1), (3L, 2), (2L, 3)))
    // the two tied rank-3 routes both join any rank-3 dropoff/pickup rows
    val tied = mp.filter($"popularity" === 3)
    assert(tied.count() >= 2)
  }

  test("dbt layer: midnight-crossing drive time truncates toward zero (F9)") {
    // dbt's tripss reads a trips table that still carries total_amount
    // (the reference's dbt source is a different trips vintage than the
    // enrichment output — SURVEY §3 EP3)
    val t = TaxiOps.tripss(TaxiOps.normalize(trips))
    // 23:59:59.5 → 00:15:00 = 900.5 s = 15.0083 min → 15 (trunc)
    val cross = t.filter($"drive_time" === 15L)
    assert(cross.count() >= 1)
    val m = TaxiOps.dailyTripMetrics(t)
    // enriched trips all pick up on 2023-02-16
    assert(m.count() === 1)
    assert(m.head().getAs[java.sql.Date]("pickup_date").toString
      === "2023-02-16")
  }
}
