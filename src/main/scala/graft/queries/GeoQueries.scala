package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tbl
import graft.functions.GeoF

/** Geo enrichment operators (SURVEY.md §2.8 F3–F6) over synthetic zone
  * geometries built from `nation` (the fixtures carry no WKT, so each
  * query *constructs* a deterministic polygon per zone in-plan, then
  * exercises the real parse → centroid → hex-index path on it).
  *
  * Zone k (k = n_nationkey ∈ [0,25)): a 0.5°×0.5° square centered at
  * lat = k/2 − 6, lng = 3k/2 − 18 — quarter-degree grid corners keep all
  * shoelace arithmetic exact in binary floating point, so the centroid is
  * bit-exactly the analytic center and the oracle can state it directly.
  */
object GeoQueries {

  private[queries] def latOf(k: Int): Double = k * 0.5 - 6.0
  private[queries] def lngOf(k: Int): Double = k * 1.5 - 18.0

  private[queries] def zonesWkt(s: SparkSession, dir: String): DataFrame = {
    val lat0 = col("n_nationkey") * 0.5 - 6.0
    val lng0 = col("n_nationkey") * 1.5 - 18.0
    def pt(lng: org.apache.spark.sql.Column, lat: org.apache.spark.sql.Column) =
      concat(lng.cast("string"), lit(" "), lat.cast("string"))
    tbl(s, dir, "nation").select(
      col("n_nationkey").as("zone_id"),
      concat(lit("POLYGON(("),
        pt(lng0 - 0.25, lat0 - 0.25), lit(", "),
        pt(lng0 + 0.25, lat0 - 0.25), lit(", "),
        pt(lng0 + 0.25, lat0 + 0.25), lit(", "),
        pt(lng0 - 0.25, lat0 + 0.25), lit(", "),
        pt(lng0 - 0.25, lat0 - 0.25), lit("))")).as("zone_geom"))
  }

  /** F3 + F5 — ST_ASTEXT (identity on WKT) and ST_CENTROID (ref
    * `enrichment_query.py:10,17`): parse each zone's WKT and compute the
    * planar area-weighted centroid. The quarter-degree construction makes
    * the result analytically exact, which the oracle states directly. */
  private def wktCentroid(s: SparkSession, dir: String): DataFrame =
    zonesWkt(s, dir)
      .select(col("zone_id"),
        round(GeoF.centroidLng(GeoF.stAsText(col("zone_geom"))), 6)
          .as("c_lng"),
        round(GeoF.centroidLat(GeoF.stAsText(col("zone_geom"))), 6)
          .as("c_lat"))
      .orderBy("zone_id")

  private val wktCentroidSql =
    """SELECT n_nationkey AS zone_id,
      |       round(n_nationkey * 1.5 - 18.0, 6) AS c_lng,
      |       round(n_nationkey * 0.5 - 6.0, 6) AS c_lat
      |FROM nation ORDER BY zone_id""".stripMargin

  /** F6 — the reference's `H3_FROMGEOGPOINT(ST_CENTROID(geom), 9)` slot
    * (`enrichment_query.py:10,17`): centroid → res-9 hex cell id, the
    * full enrichment geo path. The cell ids are [[GeoF.hexCell]]'s own
    * lattice, NOT carto-H3 numbering (claim withdrawn; see GeoF
    * scaladoc), hence the `hex_9` column name. The oracle below is the
    * lattice SPEC written directly in DuckDB SQL — a third, fully
    * independent implementation (not generated from any GeoF code path):
    * DuckDB recomputes projection → axial coords → cube rounding →
    * zigzag hex packing itself over the analytic zone centroids. The
    * only shared inputs are the published parameters (mean Earth radius,
    * res-9 edge length) and the floor(x+0.5) rounding tie-break, which
    * is engine-independent by construction (the fixture's 25 points sit
    * ≥ 1.1e-3 from every .5 boundary, so transcendental last-ulp
    * differences cannot flip a cell). What remains non-external is only
    * the absence of true carto-H3 numbering — see VERDICT "missing". */
  private def hexIndex(s: SparkSession, dir: String): DataFrame =
    zonesWkt(s, dir)
      .select(col("zone_id"),
        GeoF.hexCell(
          GeoF.centroidLat(col("zone_geom")),
          GeoF.centroidLng(col("zone_geom")), 9).as("hex_9"))
      .orderBy("zone_id")

  private val hexIndexSql = {
    // lattice parameters (values documented in GeoF): mean Earth radius
    // and the res-9 edge length 1107712.591/√7⁹ — inlined as literals so
    // the oracle text contains no computed Scala values
    val earthR = "6371007.180918475"
    val edge9 = "174.37567917659328"
    s"""WITH pt AS (
       |  SELECT n_nationkey AS zone_id,
       |         -- toRadians as x/180*pi, Java's exact operation order
       |         (n_nationkey * 0.5 - 6.0) / 180.0 * pi() AS phi,
       |         (n_nationkey * 1.5 - 18.0) / 180.0 * pi() AS lam
       |  FROM nation
       |), ax AS (
       |  SELECT zone_id,
       |         (lam * cos(phi) * $earthR * (sqrt(3.0) / 3.0)
       |            - (phi * $earthR) / 3.0) / $edge9 AS qf,
       |         (phi * $earthR) * (2.0 / 3.0) / $edge9 AS rf
       |  FROM pt
       |), cube AS (
       |  SELECT zone_id, qf, rf, -qf - rf AS sf,
       |         floor(qf + 0.5) AS qr, floor(rf + 0.5) AS rr,
       |         floor(-qf - rf + 0.5) AS sr
       |  FROM ax
       |), pick AS (
       |  SELECT zone_id,
       |         CAST(CASE WHEN abs(qr - qf) > abs(rr - rf)
       |                    AND abs(qr - qf) > abs(sr - sf)
       |                   THEN -rr - sr ELSE qr END AS BIGINT) AS q,
       |         CAST(CASE WHEN NOT (abs(qr - qf) > abs(rr - rf)
       |                             AND abs(qr - qf) > abs(sr - sf))
       |                    AND abs(rr - rf) > abs(sr - sf)
       |                   THEN -qr - sr ELSE rr END AS BIGINT) AS r
       |  FROM cube
       |)
       |SELECT zone_id,
       |       '9' || '09' ||
       |       lpad(lower(hex(CASE WHEN q >= 0 THEN q * 2
       |                           ELSE q * -2 - 1 END)), 8, '0') ||
       |       lpad(lower(hex(CASE WHEN r >= 0 THEN r * 2
       |                           ELSE r * -2 - 1 END)), 8, '0') AS hex_9
       |FROM pick ORDER BY zone_id""".stripMargin
  }

  val all: Map[String, QueryDef] = Map(
    "f5_wkt_centroid" -> QueryDef(wktCentroid, Some(wktCentroidSql)),
    "f6_hex_index" -> QueryDef(hexIndex, Some(hexIndexSql))
  )
}
