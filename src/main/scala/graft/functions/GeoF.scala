package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo scalar surface (SURVEY.md §2.8 F3–F6).
  *
  * Representation: GEOGRAPHY ≙ WKT strings (`StringType`), per SURVEY §1.3
  * — so F3 `ST_ASTEXT` is identity and F4 `byte_length` is
  * `octet_length`.
  *
  * F5 `ST_CENTROID`: exact planar area-weighted centroid of
  * POLYGON/MULTIPOLYGON WKT (shoelace; holes via signed-area
  * cancellation). BigQuery's is spherical; at taxi-zone extents (< 0.2°)
  * the planar/spherical drift is < 1e-6°, far below a res-9 cell edge —
  * divergence documented here rather than hidden (SURVEY §7.4).
  * Implemented as a registered Scala UDF (string parsing; the sanctioned
  * udf-first surface per SURVEY §2.10), upgradeable to a codegen
  * `Expression` if the scan ever becomes hash-bound.
  *
  * F6 — `hexCell(point, res)`, this library's slot for the reference's
  * `H3_FROMGEOGPOINT` (`enrichment_query.py:10,17`). It is deliberately
  * NOT H3 and does not claim H3 cell ids: carto-H3's numbering depends
  * on its icosahedral base-cell tables (122 base cells × face IJK
  * orientations), which cannot be reproduced in this offline build.
  * What it IS: a deterministic hexagonal cell index — (lat, lng, res) →
  * 19-char hex cell id, hexagonal tiling on a sinusoidal-projection
  * axial lattice, the same aperture-7 edge-length schedule as H3
  * (res-0 edge / √7ᵉʳ, so res 9 ≈ 174 m), equal ids ⟺ same cell. All
  * uses in the reference only group/join on the id, which this
  * preserves; columns derived from it are named `hex_*`, not `h3_*`, so
  * the API never implies id-level compatibility with a carto-H3 run.
  * Pure `Column` math (cos/round/when) → whole-stage codegen, no UDF on
  * the 100 TB path.
  */
object GeoF {

  /** F3 — ST_ASTEXT on our WKT representation: identity. */
  def stAsText(geom: Column): Column = geom

  /** F4 — byte_length (UTF-8 bytes, ≡ BQ byte_length). */
  def byteLength(s: Column): Column = octet_length(s)

  // ----------------------------- F5: centroid ----------------------------

  /** Parse "x y" pairs of one WKT ring. */
  private def parseRing(ring: String): Array[(Double, Double)] =
    ring.trim.split(",").map { pt =>
      val xs = pt.trim.split("\\s+")
      (xs(0).toDouble, xs(1).toDouble)
    }

  /** Signed area (shoelace, CCW positive) and area-weighted centroid
    * accumulator of one ring. */
  private def ringAreaCentroid(
      ring: Array[(Double, Double)]): (Double, Double, Double) = {
    var a = 0.0; var cx = 0.0; var cy = 0.0
    var i = 0
    val n = ring.length
    while (i < n) {
      val (x0, y0) = ring(i)
      val (x1, y1) = ring((i + 1) % n)
      val cross = x0 * y1 - x1 * y0
      a += cross
      cx += (x0 + x1) * cross
      cy += (y0 + y1) * cross
      i += 1
    }
    (a / 2.0, cx / 6.0, cy / 6.0)
  }

  /** Exact planar centroid of POINT / POLYGON / MULTIPOLYGON WKT.
    * Outer rings are wound CCW and holes CW per WKT convention, so
    * summing signed contributions subtracts holes automatically; any
    * winding works as long as holes oppose their shell. Returns
    * (lng, lat) = (x, y); None for unparseable/degenerate input. */
  def wktCentroid(wkt: String): Option[(Double, Double)] = {
    if (wkt == null) return None
    val s = wkt.trim
    try {
      val body = s.substring(s.indexOf('(')).trim
      if (s.toUpperCase.startsWith("POINT")) {
        val p = parseRing(body.replaceAll("[()]", ""))
        Some((p(0)._1, p(0)._2))
      } else if (s.toUpperCase.startsWith("POLYGON") ||
        s.toUpperCase.startsWith("MULTIPOLYGON")) {
        // split into rings: innermost parenthesized groups
        val ringRe = "\\(([^()]+)\\)".r
        var a = 0.0; var cx = 0.0; var cy = 0.0
        ringRe.findAllMatchIn(body).foreach { m =>
          val (ra, rcx, rcy) = ringAreaCentroid(parseRing(m.group(1)))
          a += ra; cx += rcx; cy += rcy
        }
        if (math.abs(a) < 1e-18) None else Some((cx / a, cy / a))
      } else None
    } catch { case _: Exception => None }
  }

  /** F5, spherical option — BigQuery `ST_CENTROID` semantics (the
    * reference's engine computes on the sphere; `enrichment_query.py:
    * 10,17`). Exact for great-circle-edged polygons via the Stokes
    * identity ∫∫_S r dA = ½ ∮_∂S r × dr: each great-circle edge P→Q
    * contributes θ·n̂ (arc angle times unit edge-plane normal), so the
    * surface integral of the position vector is ½ Σ_edges θ_e n̂_e —
    * no triangulation, no sampling. Outer rings CCW add, holes CW
    * subtract, exactly like the planar shoelace. The centroid is the
    * normalized integral, returned as (lng°, lat°); None for
    * unparseable/degenerate input (including a zero integral, e.g. a
    * hemisphere-symmetric ring). At taxi-zone extents the planar/
    * spherical divergence is sub-centimeter (measured flip rate vs the
    * planar path at H3 res 9 is in `GeoFSpec`); at continental extents
    * only this path matches BigQuery. */
  def wktCentroidSpherical(wkt: String): Option[(Double, Double)] = {
    if (wkt == null) return None
    val s = wkt.trim
    try {
      val body = s.substring(s.indexOf('(')).trim
      if (s.toUpperCase.startsWith("POINT")) {
        val p = parseRing(body.replaceAll("[()]", ""))
        Some((p(0)._1, p(0)._2))
      } else if (s.toUpperCase.startsWith("POLYGON") ||
        s.toUpperCase.startsWith("MULTIPOLYGON")) {
        var vx = 0.0; var vy = 0.0; var vz = 0.0
        // Vertex-direction sum: orientation witness for the winding fix
        // below. For any sub-hemisphere geometry all vertices lie within
        // 90° of the true centroid, so the summed unit vectors point
        // into the region's hemisphere regardless of ring winding.
        var sx = 0.0; var sy = 0.0; var sz = 0.0
        val ringRe = "\\(([^()]+)\\)".r
        ringRe.findAllMatchIn(body).foreach { m =>
          val ring = parseRing(m.group(1)).map { case (lng, lat) =>
            val (lam, phi) = (math.toRadians(lng), math.toRadians(lat))
            (math.cos(phi) * math.cos(lam),
              math.cos(phi) * math.sin(lam), math.sin(phi))
          }
          ring.foreach { case (x, y, z) => sx += x; sy += y; sz += z }
          val n = ring.length
          var i = 0
          while (i < n) {
            val (ax, ay, az) = ring(i)
            val (bx, by, bz) = ring((i + 1) % n)
            val (cx0, cy0, cz0) =
              (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)
            val cross = math.sqrt(cx0 * cx0 + cy0 * cy0 + cz0 * cz0)
            val dot = ax * bx + ay * by + az * bz
            val theta = math.atan2(cross, dot)
            if (cross > 1e-30) { // skip degenerate/repeated vertices
              val f = theta / cross
              vx += cx0 * f; vy += cy0 * f; vz += cz0 * f
            }
            i += 1
          }
        }
        // Winding normalization (round-9 advice): the Stokes edge-sum is
        // winding-SENSITIVE — a CW-wound outer ring (the common ESRI/
        // shapefile convention) yields the ANTIPODAL vector. The planar
        // path divides by signed area and is winding-agnostic, and
        // BigQuery ST_CENTROID on unoriented WKT takes the smaller
        // region; match both by flipping when the integral points away
        // from the vertex hemisphere. Valid for sub-hemisphere input
        // (every vertex within 90° of the centroid — all real zone/
        // region geometries); a super-hemisphere polygon is ambiguous
        // from unoriented WKT anyway.
        if (vx * sx + vy * sy + vz * sz < 0) { vx = -vx; vy = -vy; vz = -vz }
        val norm = math.sqrt(vx * vx + vy * vy + vz * vz)
        if (norm < 1e-15) None
        else Some((math.toDegrees(math.atan2(vy, vx)),
          math.toDegrees(math.atan2(vz, math.hypot(vx, vy)))))
      } else None
    } catch { case _: Exception => None }
  }

  /** Java-friendly static forms for generated code (null = no centroid). */
  def centroidLngJava(w: String): java.lang.Double =
    wktCentroid(w) match {
      case Some((lng, _)) => java.lang.Double.valueOf(lng)
      case None => null
    }
  def centroidLatJava(w: String): java.lang.Double =
    wktCentroid(w) match {
      case Some((_, lat)) => java.lang.Double.valueOf(lat)
      case None => null
    }
  def centroidSphLngJava(w: String): java.lang.Double =
    wktCentroidSpherical(w) match {
      case Some((lng, _)) => java.lang.Double.valueOf(lng)
      case None => null
    }
  def centroidSphLatJava(w: String): java.lang.Double =
    wktCentroidSpherical(w) match {
      case Some((_, lat)) => java.lang.Double.valueOf(lat)
      case None => null
    }

  /** F5 as columns: native codegen expressions (no UDF SerDe; stays in
    * whole-stage codegen — see [[graft.plans.WktCentroidBase]]).
    * Spark 4 Columns wrap ColumnNodes, not Expressions; the classic
    * bridge is `classic.ExpressionUtils`. */
  def centroidLng(geom: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.WktCentroidLng(
        org.apache.spark.sql.GraftBridge.expression(geom)))
  def centroidLat(geom: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.WktCentroidLat(
        org.apache.spark.sql.GraftBridge.expression(geom)))

  /** Spherical-centroid columns (BigQuery semantics) — same codegen path. */
  def centroidSphLng(geom: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.WktCentroidSphLng(
        org.apache.spark.sql.GraftBridge.expression(geom)))
  def centroidSphLat(geom: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.WktCentroidSphLat(
        org.apache.spark.sql.GraftBridge.expression(geom)))

  // ----------------------------- F6: H3 index ----------------------------

  /** F6 — `h3Cell(lat, lng, res)`: TRUE H3 cell id (lowercase 15-hex
    * string), the reference's `H3_FROMGEOGPOINT(point, res)`
    * (`enrichment_query.py:10,17`). Backed by [[H3.latLngToCell]]
    * (published-algorithm implementation, validated against published
    * vectors in `H3Spec`) through the codegen expression
    * [[graft.plans.H3Cell]] — whole-stage codegen, no UDF. Supersedes
    * [[hexCell]] (the pre-H3 lattice stand-in, kept below for
    * continuity). */
  def h3Cell(lat: Column, lng: Column, res: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.H3Cell(
        org.apache.spark.sql.GraftBridge.expression(lat),
        org.apache.spark.sql.GraftBridge.expression(lng), res))

  /** Inverse of [[h3Cell]] — exact cell-center lat/lng (degrees) from a
    * canonical hex cell-id string. Backed by [[H3.cellToLatLng]] through
    * the codegen expressions [[graft.plans.H3CenterLat]]/[[graft.plans.H3CenterLng]]. */
  def h3CenterLat(cell: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.H3CenterLat(
        org.apache.spark.sql.GraftBridge.expression(cell)))
  def h3CenterLng(cell: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.H3CenterLng(
        org.apache.spark.sql.GraftBridge.expression(cell)))

  /** Grid traversal: sorted hex ids of every cell within grid distance
    * `k` of `cell`, including `cell` itself — the ring-expansion
    * primitive for H3 spatial joins. Backed by [[graft.plans.H3Disk]]
    * (codegen) over [[H3.gridDisk]] — exact (complete and
    * false-positive-free) since the round-12 overage-normalization
    * repair. */
  def h3GridDisk(cell: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.H3Disk(
        org.apache.spark.sql.GraftBridge.expression(cell), k))

  /** h3lib `cellToBoundary` as WKT — the cell's polygon (6 corners, 5
    * for pentagons), composable with the WKT surface here (ST_ASTEXT /
    * centroid / polyfill). Backed by [[H3.cellToBoundary]] through the
    * codegen expression [[graft.plans.H3Boundary]].
    *
    * Corner geometry (round 14): every corner is computed EXACTLY in
    * its owning chart through the substrate (3×-lattice) edge
    * isometries — the derived analog of h3lib's per-vertex substrate
    * `_adjustOverage` — so shared corners are bit-canonical across all
    * generating cells at every res (integer face ownership, no float
    * ties; spec-pinned exhaustively at res 0–2 and sampled bit-level at
    * res 3–4 in `H3Spec`), pentagon corners adopt their flanks' exact
    * corners everywhere, and the pre-round-14 fallback/skeleton
    * residual sets are EMPTY. The one remaining divergence from h3lib:
    * this surface emits the TRUE CORNERS only — for h3lib's
    * edge-crossing distortion vertices (up to 10 per face-straddling
    * hexagon) use [[h3BoundaryFull]]. Closure laws (centroid re-indexes
    * to the cell) are oracle-gated at res 9 in `x_h3_boundary`. */
  def h3Boundary(cell: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.H3Boundary(
        org.apache.spark.sql.GraftBridge.expression(cell)))

  /** [[h3Boundary]] plus h3lib's edge-crossing DISTORTION vertices
    * (round 13): wherever a cell edge crosses an icosahedron face edge
    * — the perpendicular-bisector great circle of two face centers —
    * the exact intersection point is inserted, giving full h3lib
    * vertex parity (up to 10 vertices) for face-straddling cells where
    * the plain form emits the 6 true corners only. Same WKT surface;
    * laws spec-pinned exhaustively at res 0–2 in `H3Spec`. */
  def h3BoundaryFull(cell: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.H3BoundaryFull(
        org.apache.spark.sql.GraftBridge.expression(cell)))

  // ------------------- H3 hierarchy (parent / children) ------------------

  /** h3lib `cellToParent` — the res-`res` ancestor by digit truncation
    * ([[H3.cellToParent]], codegen via [[graft.plans.H3Parent]]). `res`
    * may be a runtime column so a fact row can take parents at each
    * resolution present in a compacted cover. */
  def h3Parent(cell: Column, res: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.H3Parent(
        org.apache.spark.sql.GraftBridge.expression(cell),
        org.apache.spark.sql.GraftBridge.expression(res)))

  def h3Parent(cell: Column, res: Int): Column =
    h3Parent(cell, org.apache.spark.sql.functions.lit(res))

  /** h3lib `cellToChildren` — all res-`childRes` descendants, ascending,
    * pentagon-aware ([[H3.cellToChildren]], codegen via
    * [[graft.plans.H3Children]]). Fan-out is 7^(childRes−res); call
    * sites state the bound in the plan by passing a literal res. */
  def h3Children(cell: Column, childRes: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.H3Children(
        org.apache.spark.sql.GraftBridge.expression(cell), childRes))

  /** h3lib `gridDistance` — shortest-grid-path length between two
    * same-res cells ([[H3.gridDistance]], codegen via
    * [[graft.plans.H3GridDistance]]). */
  def h3GridDistance(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.H3GridDistance(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** h3lib `gridPathCells`, canonicalized — the min-id-greedy minimal
    * path, gridDistance+1 cells inclusive ([[H3.gridPathCells]], codegen
    * via [[graft.plans.H3GridPath]]; h3lib disclaims WHICH minimal path
    * it returns, so the engine defines the deterministic one an
    * independent oracle can restate). */
  def h3GridPath(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.H3GridPath(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** h3lib `compactCells` over an in-row array of uniform-res cells —
    * the per-ancestor-group kernel of [[graft.ops.H3Compact]]. */
  def h3CompactArray(cells: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.H3CompactArray(
        org.apache.spark.sql.GraftBridge.expression(cells)))

  /** Resolution of a canonical 15-hex cell id — the H3 res field is
    * bits 52–55, exactly the id's second hex digit, so this is a pure
    * built-in substring/conv chain (no custom expression needed). */
  def h3Resolution(cell: Column): Column = {
    import org.apache.spark.sql.functions.{conv, substring}
    conv(substring(cell, 2, 1), 16, 10).cast("int")
  }

  // ------------------- H3 polyfill (polygon → cells) ---------------------

  /** All rings of a (MULTI)POLYGON WKT as planar (lng, lat) vertex
    * arrays (innermost parenthesized groups — same parse as
    * [[wktCentroid]]); empty for POINT/unparseable input. */
  private[functions] def parseRings(wkt: String): Array[Array[(Double, Double)]] = {
    if (wkt == null) return Array.empty
    val s = wkt.trim
    val u = s.toUpperCase
    if (!u.startsWith("POLYGON") && !u.startsWith("MULTIPOLYGON"))
      return Array.empty
    try {
      val body = s.substring(s.indexOf('('))
      "\\(([^()]+)\\)".r.findAllMatchIn(body)
        .map(m => parseRing(m.group(1))).toArray
    } catch { case _: Exception => Array.empty }
  }

  /** Even-odd ray-cast containment over ALL rings in planar lng/lat —
    * parity across shell + hole rings excludes holes automatically,
    * winding-agnostic. Points exactly on an edge are boundary cases
    * (measure-zero for cell centers vs analytic fixtures). */
  private[functions] def pointInRings(lng: Double, lat: Double,
      rings: Array[Array[(Double, Double)]]): Boolean = {
    var inside = false
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      val n = ring.length
      var i = 0
      while (i < n) {
        val (x0, y0) = ring(i)
        val (x1, y1) = ring((i + 1) % n)
        if ((y0 > lat) != (y1 > lat)) {
          val xi = x0 + (lat - y0) * (x1 - x0) / (y1 - y0)
          if (xi > lng) inside = !inside
        }
        i += 1
      }
      r += 1
    }
    inside
  }

  /** H3 polyfill — h3lib `polygonToCells` with CENTER-containment
    * semantics: the sorted hex ids of every res-`res` cell whose
    * center lies inside the polygon (shell minus holes). BFS over the
    * polygon's bounding box in the exact H3 grid ([[H3.gridRing1]],
    * exact since the round-12 overage-normalization repair): seed at
    * the first vertex's cell, expand ring-1 adjacency while centers
    * stay inside the padded bbox, collect centers that test inside.
    * The padded-bbox cell graph is connected, so every center-inside
    * cell is reached; soundness and completeness are spec-pinned in
    * `GeoFSpec`. Planar lng/lat geometry — same contract as the other
    * planar WKT functions here (fixture extents sit far from the
    * antimeridian and poles). Cost is O(bbox area / cell area); the
    * 4M-cell guard rejects a res too fine for the polygon rather than
    * letting a driver-side loop run away — at 100 TB scale polyfill
    * is a per-POLYGON cost (dimension side, e.g. 25 zones), never a
    * per-fact-row cost: facts index by point ([[h3Cell]]) and join the
    * exploded cell list.
    */
  def h3PolyfillScala(wkt: String, res: Int): Array[String] = {
    require(res >= 0 && res <= 15, s"resolution $res out of [0,15]")
    val rings = parseRings(wkt)
    if (rings.isEmpty || rings.forall(_.length < 3)) return Array.empty
    var minLng = Double.MaxValue; var maxLng = Double.MinValue
    var minLat = Double.MaxValue; var maxLat = Double.MinValue
    for (ring <- rings; (x, y) <- ring) {
      if (x < minLng) minLng = x
      if (x > maxLng) maxLng = x
      if (y < minLat) minLat = y
      if (y > maxLat) maxLat = y
    }
    // pad by ~1.5 cell pitches so the BFS domain stays grid-connected
    // around thin/concave shapes
    val pitchDeg = math.toDegrees(0.3695 / math.pow(math.sqrt(7.0), res))
    val padLat = 1.5 * pitchDeg
    val midLat = math.toRadians((minLat + maxLat) / 2)
    val padLng = padLat / math.max(0.2, math.cos(midLat))
    val (v0x, v0y) = rings(0)(0)
    val seed = H3.latLngToCell(v0y, v0x, res)
    var seen = Set(seed)
    var frontier = List(seed)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (frontier.nonEmpty) {
      require(seen.size <= 4000000,
        s"polyfill at res $res exceeds 4M cells for this polygon — " +
          "use a coarser resolution")
      var next = List.empty[Long]
      frontier.foreach { c =>
        val (cLat, cLng) = H3.cellToLatLng(c)
        val inBox = cLng >= minLng - padLng && cLng <= maxLng + padLng &&
          cLat >= minLat - padLat && cLat <= maxLat + padLat
        if (inBox) {
          if (pointInRings(cLng, cLat, rings)) out += c
          H3.gridRing1(c).foreach { nb =>
            if (!seen(nb)) { seen += nb; next ::= nb }
          }
        }
      }
      frontier = next
    }
    val arr = out.toArray
    java.util.Arrays.sort(arr)
    arr.map(c => f"$c%x")
  }

  /** Column form of [[h3PolyfillScala]] — codegen expression
    * ([[graft.plans.H3Polyfill]]), array of sorted hex cell ids. */
  def h3Polyfill(geom: Column, res: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.H3Polyfill(
        org.apache.spark.sql.GraftBridge.expression(geom), res))

  // ------------------- legacy hex lattice (pre-H3 stand-in) --------------

  /** Mean Earth radius (m), and H3's res-0 edge length (m); each res
    * divides the edge by √7 (aperture-7 schedule, same as H3). */
  private val EarthR = 6371007.180918475
  private val Res0EdgeM = 1107712.591

  def edgeLengthM(res: Int): Double =
    Res0EdgeM / math.pow(math.sqrt(7.0), res)

  /** (lat°, lng°, res) → cell id Column. Sinusoidal (equal-area-ish)
    * projection to meters, axial hex coordinates, cube rounding, packed
    * as `"9%02x%08x%08x"`-style 19-char hex (res byte + zigzag q + r).
    * 8 hex chars per coordinate: the zigzagged axial coordinate is
    * bounded by ~2·(π·R·(√3/3+1/3))/edge(res) < 2³² for every res ≤ 15,
    * so `lpad` never sees an over-wide input and cannot truncate
    * distinct cells into a collision (6 chars overflowed at res ≥ 14). */
  def hexCell(lat: Column, lng: Column, res: Int): Column = {
    require(res >= 0 && res <= 15,
      s"hexCell resolution must be in [0, 15], got $res")
    val s = edgeLengthM(res) // hex size parameter (center→vertex)
    val phi = radians(lat)
    val x = radians(lng) * cos(phi) * EarthR
    val y = phi * EarthR
    // axial coords (pointy-top): q = (√3/3·x − 1/3·y)/s, r = 2/3·y/s
    val qf = (x * (math.sqrt(3.0) / 3.0) - y / 3.0) / s
    val rf = y * (2.0 / 3.0) / s
    val sf = -qf - rf
    // cube rounding; nearest-integer via floor(x+0.5) — identical on
    // every engine evaluating the same double (Spark's round() is
    // BigDecimal HALF_UP, DuckDB's is half-away — they disagree on exact
    // negative halves; a .5 axial coordinate is a cell-boundary tie, so
    // any consistent choice is a valid tie-break)
    val qr = floor(qf + 0.5); val rr = floor(rf + 0.5)
    val sr = floor(sf + 0.5)
    val dq = abs(qr - qf); val dr = abs(rr - rf); val ds = abs(sr - sf)
    val q = when(dq > dr && dq > ds, -rr - sr).otherwise(qr).cast("long")
    val r = when(!(dq > dr && dq > ds) && dr > ds, -qr - sr)
      .otherwise(rr).cast("long")
    // zigzag-encode to non-negatives, pack as hex: "9" + res + q + r
    def zz(c: Column): Column =
      when(c >= 0, c * 2).otherwise(c * -2 - 1)
    concat(lit("9"), lpad(lower(hex(lit(res))), 2, "0"),
      lpad(lower(hex(zz(q))), 8, "0"), lpad(lower(hex(zz(r))), 8, "0"))
  }

  /** Scala-side mirror of [[hexCell]] for unit tests. Rounding is the
    * same floor(x+0.5) tie-break as the Column path (and the independent
    * SQL oracle in GeoQueries), so all three implementations agree
    * bit-for-bit on identical doubles. */
  def hexCellScala(lat: Double, lng: Double, res: Int): String = {
    require(res >= 0 && res <= 15,
      s"hexCell resolution must be in [0, 15], got $res")
    def rnd(x: Double): Double = math.floor(x + 0.5)
    val s = edgeLengthM(res)
    val phi = math.toRadians(lat)
    val x = math.toRadians(lng) * math.cos(phi) * EarthR
    val y = phi * EarthR
    val qf = (x * (math.sqrt(3.0) / 3.0) - y / 3.0) / s
    val rf = y * (2.0 / 3.0) / s
    val sf = -qf - rf
    var qr = rnd(qf)
    var rr = rnd(rf)
    val sr = rnd(sf)
    val (dq, dr, ds) =
      (math.abs(qr - qf), math.abs(rr - rf), math.abs(sr - sf))
    if (dq > dr && dq > ds) qr = -rr - sr
    else if (dr > ds) rr = -qr - sr
    def zz(c: Long): Long = if (c >= 0) c * 2 else c * -2 - 1
    f"9${res}%02x${zz(qr.toLong)}%08x${zz(rr.toLong)}%08x"
  }
}
