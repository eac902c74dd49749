package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.eventsTbl
import graft.functions.GeoF
import graft.ops.TaxiOps

/** End-to-end fidelity of the PUBLIC API: the full reference chain
  * `TaxiOps.normalize → TaxiOps.enrich → TaxiOps.mostPopulars` on
  * TLC-shaped trips synthesized from `events` (pickup=ts, dropoff=ts +
  * event_id%3600 s — integer arithmetic, engine-exact; passengers =
  * user_id%5 with real zeros; pickup zone = event_id%30 so ids 25–29 miss
  * the zone dim and must be killed by the post-join finish_rank filter)
  * and `taxi_zone_geom` built from `nation` with the quarter-grid WKT
  * squares (analytic centroids → hex ids stated by the Scala mirror).
  * The oracle replays every stage in SQL — this is the query a reference
  * user's whole daily run compiles to. */
object FidelityQueries {

  private def trips(s: SparkSession, dir: String): DataFrame =
    eventsTbl(s, dir).select(
      col("ts").as("pickup_datetime"),
      timestamp_micros(unix_micros(col("ts")) +
        (col("event_id") % 3600) * 1000000L).as("dropoff_datetime"),
      (col("user_id") % 5).as("passenger_count"),
      col("value").as("trip_distance"),
      col("value").as("fare_amount"),
      col("value").as("total_amount"),
      (col("event_id") % 30).as("pickup_location_id"),
      (col("user_id") % 25).as("dropoff_location_id"))

  private def zones(s: SparkSession, dir: String): DataFrame =
    GeoQueries.zonesWkt(s, dir)
      .select(col("zone_id").cast("long").as("zone_id"), col("zone_geom"))

  private def taxiFull(s: SparkSession, dir: String): DataFrame = {
    val mp = TaxiOps.mostPopulars(
      TaxiOps.enrich(TaxiOps.normalize(trips(s, dir)), zones(s, dir)))
    mp.select(col("popularity"),
      col("route.pickup_hexagons").as("route_pickup_hex"),
      col("route.dropoff_hexagons").as("route_dropoff_hex"),
      col("route_count"),
      col("hex_dropoff").as("top_dropoff_hex"), col("dropoff_count"),
      col("hex_pickup").as("top_pickup_hex"), col("pickup_count"))
      .orderBy("popularity", "route_pickup_hex", "route_dropoff_hex",
        "top_dropoff_hex", "top_pickup_hex")
  }

  private val taxiFullSql = {
    val hexRows = (0 until 25).map(k =>
      s"($k, '${GeoF.hexCellScala(GeoQueries.latOf(k), GeoQueries.lngOf(k), 9)}')")
      .mkString(", ")
    s"""WITH trips AS (
       |  SELECT ts AS pickup_datetime,
       |         ts + (event_id % 3600) * INTERVAL '1 second'
       |           AS dropoff_datetime,
       |         user_id % 5 AS passenger_count,
       |         value AS trip_distance, value AS fare_amount,
       |         event_id % 30 AS pickup_location_id,
       |         user_id % 25 AS dropoff_location_id
       |  FROM events
       |), norm AS (
       |  SELECT * FROM trips
       |  WHERE pickup_datetime != dropoff_datetime
       |    AND passenger_count != 0 AND passenger_count IS NOT NULL
       |    AND trip_distance != 0 AND trip_distance IS NOT NULL
       |    AND fare_amount != 0
       |), zone_hex AS (
       |  SELECT * FROM (VALUES $hexRows) AS t(zone_id, hex)
       |), doff AS (
       |  SELECT n.pickup_datetime, n.dropoff_datetime,
       |         n.pickup_location_id, n.dropoff_location_id,
       |         z.hex AS hex_dropoff
       |  FROM norm n LEFT JOIN zone_hex z ON n.dropoff_location_id = z.zone_id
       |  WHERE z.zone_id IS NOT NULL
       |), pup AS (
       |  SELECT n.pickup_datetime, n.dropoff_datetime,
       |         n.pickup_location_id, n.dropoff_location_id,
       |         z.hex AS hex_pickup
       |  FROM norm n LEFT JOIN zone_hex z ON n.pickup_location_id = z.zone_id
       |  WHERE z.zone_id IS NOT NULL
       |), enriched AS (
       |  SELECT p.hex_pickup, d.hex_dropoff
       |  FROM doff d JOIN pup p
       |    ON d.pickup_datetime = p.pickup_datetime
       |   AND d.dropoff_datetime = p.dropoff_datetime
       |   AND d.pickup_location_id = p.pickup_location_id
       |   AND d.dropoff_location_id = p.dropoff_location_id
       |), routes AS (
       |  SELECT hex_pickup AS route_pickup_hex, hex_dropoff AS route_dropoff_hex,
       |         route_count, rank() OVER (ORDER BY route_count DESC)
       |           AS popularity
       |  FROM (
       |    SELECT hex_pickup, hex_dropoff, count(*) AS route_count
       |    FROM enriched GROUP BY hex_pickup, hex_dropoff
       |    ORDER BY route_count DESC, hex_pickup, hex_dropoff LIMIT 100
       |  )
       |), dropoffs AS (
       |  SELECT hex_dropoff AS top_dropoff_hex, dropoff_count,
       |         rank() OVER (ORDER BY dropoff_count DESC) AS popularity
       |  FROM (
       |    SELECT hex_dropoff, count(*) AS dropoff_count
       |    FROM enriched GROUP BY hex_dropoff
       |    ORDER BY dropoff_count DESC, hex_dropoff LIMIT 100
       |  )
       |), pickups AS (
       |  SELECT hex_pickup AS top_pickup_hex, pickup_count,
       |         rank() OVER (ORDER BY pickup_count DESC) AS popularity
       |  FROM (
       |    SELECT hex_pickup, count(*) AS pickup_count
       |    FROM enriched GROUP BY hex_pickup
       |    ORDER BY pickup_count DESC, hex_pickup LIMIT 100
       |  )
       |)
       |SELECT r.popularity, r.route_pickup_hex, r.route_dropoff_hex,
       |       r.route_count, d.top_dropoff_hex, d.dropoff_count,
       |       p.top_pickup_hex, p.pickup_count
       |FROM routes r
       |JOIN dropoffs d USING (popularity)
       |JOIN pickups p USING (popularity)
       |ORDER BY popularity, route_pickup_hex, route_dropoff_hex,
       |         top_dropoff_hex, top_pickup_hex""".stripMargin
  }

  val all: Map[String, QueryDef] = Map(
    "q_taxi_full" -> QueryDef(taxiFull, Some(taxiFullSql), bench = true)
  )
}
