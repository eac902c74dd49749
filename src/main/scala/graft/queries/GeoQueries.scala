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

  /** F6 — the reference's `H3_FROMGEOGPOINT(ST_CENTROID(geom), 9)`
    * (`enrichment_query.py:10,17`): centroid → TRUE res-9 H3 cell id,
    * the full enrichment geo path. The ids are real Uber/carto H3
    * (published-algorithm implementation in [[graft.functions.H3]],
    * validated against published vectors in `H3Spec`), hence the column
    * is named `h3_9` — id-level compatibility with a carto-H3 run is
    * now claimed and oracle-checked. The oracle is an independent
    * DuckDB-SQL implementation of `latLngToCell` — see
    * [[H3OracleSql]] for authorship/provenance notes (10 of the 25
    * fixture centroids land in PENTAGON base cells, so the hard path is
    * genuinely exercised). */
  private def hexIndex(s: SparkSession, dir: String): DataFrame =
    zonesWkt(s, dir)
      .select(col("zone_id"),
        GeoF.h3Cell(
          GeoF.centroidLat(col("zone_geom")),
          GeoF.centroidLng(col("zone_geom")), 9).as("h3_9"))
      .orderBy("zone_id")

  /** H3 round-trip: centroid → res-9 cell → [[GeoF.h3CenterLat]]/
    * [[GeoF.h3CenterLng]] (the `cellToLatLng` inverse) → re-index the
    * exact center → cell. The output column is the RE-INDEXED cell,
    * gated by the SAME independent DuckDB-SQL forward oracle as
    * `f6_hex_index`: the hashes only match if cell→center→cell is the
    * identity for every fixture cell (10 of 25 in pentagon base cells,
    * so the pentagon inverse path — orbit un-rotation, escape
    * pre-images, cross-face overage — is exercised under the gate).
    * Resolution-sweep and pentagon-children coverage live in
    * `H3Spec`'s round-trip properties. */
  private def h3Roundtrip(s: SparkSession, dir: String): DataFrame =
    zonesWkt(s, dir)
      .select(col("zone_id"),
        GeoF.h3Cell(
          GeoF.centroidLat(col("zone_geom")),
          GeoF.centroidLng(col("zone_geom")), 9).as("h3_fwd"))
      .select(col("zone_id"),
        GeoF.h3Cell(
          GeoF.h3CenterLat(col("h3_fwd")),
          GeoF.h3CenterLng(col("h3_fwd")), 9).as("h3_9"))
      .orderBy("zone_id")

  /** H3 grid traversal (round 11): each zone's res-5 cell and its full
    * 1-disk ([[GeoF.h3GridDisk]] → explode) — the ring-expansion
    * primitive of an H3 spatial join, over the same enrichment path the
    * reference indexes (`enrichment_query.py:10,17` stops at the cell;
    * the disk is the natural next operator a geo warehouse needs).
    * Hash-gated since round 12: [[H3OracleSql.ring]] reconstructs the
    * full disk membership in DuckDB from the SQL forward alone via
    * probe-grid adjacency witnesses (≥3 boundary crossings per edge) —
    * `H3Spec`'s traversal properties (symmetry, disk counts, pentagon
    * rings) remain the algorithmic gate at other resolutions. */
  private def h3Ring(s: SparkSession, dir: String): DataFrame =
    zonesWkt(s, dir)
      .select(col("zone_id"),
        GeoF.h3Cell(
          GeoF.centroidLat(col("zone_geom")),
          GeoF.centroidLng(col("zone_geom")), 5).as("cell"))
      .select(col("zone_id"), col("cell"),
        explode(GeoF.h3GridDisk(col("cell"), 1)).as("ring_cell"))
      .orderBy("zone_id", "ring_cell")

  /** H3 spatial join: zone pairs whose res-3 cells are identical or
    * grid-adjacent — explode one side's 1-disk and EQUI-join on the
    * cell id. This is the 100 TB shape for proximity joins: cost is
    * collision volume on the cell key (shuffle-hash or broadcast),
    * never an all-pairs distance cross join; ring radius k trades
    * reach for candidate volume exactly like the LSH band knobs.
    * Hash-gated since round 12 ([[H3OracleSql.spatialJoin]]): DuckDB
    * re-derives each zone's res-3 cell with the SQL forward and the
    * adjacency relation with probe-grid boundary witnesses. */
  private def h3SpatialJoin(s: SparkSession, dir: String): DataFrame = {
    val cells = zonesWkt(s, dir)
      .select(col("zone_id"),
        GeoF.h3Cell(
          GeoF.centroidLat(col("zone_geom")),
          GeoF.centroidLng(col("zone_geom")), 3).as("cell"))
    val probes = cells.select(col("zone_id").as("zone_a"),
      explode(GeoF.h3GridDisk(col("cell"), 1)).as("cell"))
    probes
      .join(cells.select(col("zone_id").as("zone_b"), col("cell")), "cell")
      .filter(col("zone_a") < col("zone_b"))
      .select("zone_a", "zone_b").distinct()
      .orderBy("zone_a", "zone_b")
  }

  /** H3 polyfill (round 11, second half): each zone polygon → the
    * res-5 cells whose centers it contains ([[GeoF.h3Polyfill]],
    * h3lib `polygonToCells` center semantics over the exact
    * traversal), exploded — the polygon-containment-join primitive.
    * At 100 TB the shape is polyfill-the-dimension + equi-join facts
    * indexed by point ([[GeoF.h3Cell]]): containment priced as
    * hash-join collision volume, never per-fact-row point-in-polygon.
    * Hash-gated since round 12 ([[H3OracleSql.polyfill]]): DuckDB
    * reconstructs every candidate cell's exact center via staged
    * digit-0 center-chain probe refinement (res 7 discovery → res
    * 9/11/13/15, final localization ≤ 6.2e-6° vs a measured 4.3e-5°
    * worst center-to-boundary margin) and classifies center-in-square
    * itself — the full membership set under the hash, with
    * `GeoFSpec`'s soundness/completeness/hole properties as the
    * algorithmic gate on arbitrary polygons. */
  private def h3Polyfill(s: SparkSession, dir: String): DataFrame =
    zonesWkt(s, dir)
      .select(col("zone_id"),
        explode(GeoF.h3Polyfill(col("zone_geom"), 5)).as("cell"))
      .orderBy("zone_id", "cell")

  // ----------------- H3 hierarchy (round 12) -----------------------------

  /** Hierarchy scalar surface under the independent SQL oracle:
    * parents of the forward res-9 cell at res 5 and 1
    * ([[GeoF.h3Parent]] — h3lib `cellToParent`), and the res-7
    * children count of the res-5 parent ([[GeoF.h3Children]] — h3lib
    * `cellToChildren`; 49, or 41 when the parent is a pentagon cell).
    * DuckDB re-derives all of it as bit arithmetic on the forward id
    * ([[H3OracleSql.hierarchy]]). */
  private def h3Hierarchy(s: SparkSession, dir: String): DataFrame =
    zonesWkt(s, dir)
      .select(col("zone_id"),
        GeoF.h3Cell(
          GeoF.centroidLat(col("zone_geom")),
          GeoF.centroidLng(col("zone_geom")), 9).as("h3_9"))
      .select(col("zone_id"), col("h3_9"),
        GeoF.h3Parent(col("h3_9"), 5).as("p5"),
        GeoF.h3Parent(col("h3_9"), 1).as("p1"),
        size(GeoF.h3Children(GeoF.h3Parent(col("h3_9"), 5), 7))
          .as("n_kids"))
      .orderBy("zone_id")

  /** Compact/uncompact test universe: all res-7 children of each
    * zone's res-5 cell, minus a deterministic drop rule (both new
    * digits equal zone_id mod 7) that leaves exactly one res-6 sibling
    * set incomplete per zone — so the distributed compact genuinely
    * promotes one level and strands another. Mirrored digit-for-digit
    * in the SQL oracle ([[H3OracleSql.keptKids]]). */
  private def h3KeptKids(s: SparkSession, dir: String): DataFrame = {
    val c5 = zonesWkt(s, dir).select(col("zone_id"),
      GeoF.h3Parent(GeoF.h3Cell(
        GeoF.centroidLat(col("zone_geom")),
        GeoF.centroidLng(col("zone_geom")), 9), 5).as("c5"))
    val kids = c5.select(col("zone_id"),
      explode(GeoF.h3Children(col("c5"), 7)).as("cell"))
    val hv = conv(col("cell"), 16, 10).cast("long")
    val d6 = shiftright(hv, 27).bitwiseAND(7)
    val d7 = shiftright(hv, 24).bitwiseAND(7)
    kids.filter(!(d6 === col("zone_id") % 7 && d7 === col("zone_id") % 7))
  }

  /** h3lib `compactCells`, distributed ([[graft.ops.H3Compact]]): the
    * minimal mixed-res cover of the kept child set, zone-scoped. The
    * oracle unrolls both compaction levels as SQL window counts over
    * the same bit-assembled child universe. */
  private def h3CompactQ(s: SparkSession, dir: String): DataFrame =
    graft.ops.H3Compact.compact(h3KeptKids(s, dir), "cell", 7,
        Seq("zone_id"))
      .withColumn("cres", GeoF.h3Resolution(col("cell")))
      .orderBy("zone_id", "cell")

  /** uncompact ∘ compact must be the identity on the input cover —
    * the oracle states the input set directly. */
  private def h3UncompactQ(s: SparkSession, dir: String): DataFrame =
    graft.ops.H3Compact.uncompact(
        graft.ops.H3Compact.compact(h3KeptKids(s, dir), "cell", 7,
          Seq("zone_id")),
        "cell", 7, Seq("zone_id"))
      .orderBy("zone_id", "cell")

  /** The 100 TB containment-join shape end-to-end: polyfill each zone
    * at res 6 → compact the cover → index facts by point at res 6 →
    * explode each fact's parent at every resolution PRESENT in the
    * cover (the cover's distinct-res set, ≤ 7 values, collected once
    * driver-side from the checkpointed cover and inlined as a literal
    * array) → equi-join on the cell id. Join cost is hash-collision
    * volume on the compacted (≥ 7×-smaller) cover — never
    * per-fact-row point-in-polygon, never an all-pairs distance join.
    * Fact points are placed ≥ 0.1° inside their zone while a res-6
    * circumradius is ~0.03°, so every fact's cell center is inside the
    * zone and the count is exactly the per-zone fact population — which
    * the oracle states with no H3 at all ([[H3OracleSql.multiresJoin]]). */
  private def h3MultiresJoin(s: SparkSession, dir: String): DataFrame = {
    // ROW-LOCAL compaction (round 13, second cut): polyfill emits each
    // zone's complete res-6 cell set as ONE array in ONE row, and
    // compaction is zone-scoped here — so the minimal cover is a pure
    // per-row kernel call ([[GeoF.h3CompactArray]], the same codegen
    // kernel the distributed path groups for), NOT a shuffle. This
    // replaces the 2-iteration [[graft.ops.H3Compact.compact]] chain
    // (same output, oracle-checked; the distributed compact remains the
    // right tool when the cover arrives exploded/ungrouped — the
    // `x_h3_compact` gate still exercises it). Scale note: per-row
    // state is the polyfill array itself, which the polyfill expression
    // already bounds; a polygon too big for that bound needs the
    // exploded + distributed path anyway.
    //
    // localCheckpoint: the cover feeds TWO consumers (the distinct-res
    // collect and the join broadcast) and without it the polyfill →
    // compact scan executes twice. The cover is the small result of
    // real compute — the checkpoint-the-SMALL-side pattern.
    val cover = zonesWkt(s, dir)
      .select(col("zone_id"),
        explode(GeoF.h3CompactArray(
          GeoF.h3Polyfill(col("zone_geom"), 6))).as("cell"))
      .localCheckpoint(false)
    // Distinct-res dimension as a BOUNDED driver collect (round 13,
    // verdict item 3): a compacted res-6 cover holds at most the 7
    // resolutions 0..6, so this collect is fixture-independent-bounded
    // (≤ 7 rows) like the manifest/BPE collects the audit admits. It
    // replaces the previous crossJoin(broadcast(distinct-res)) — one
    // aggregate + one broadcast build fewer in the fact-side chain, and
    // the probe explode becomes a literal array (sf1 chain cost was
    // 4.7×, dominated by this fixed 11-job AQE granularity, not data).
    // (A static 0..6 explode with no collect was A/B'd at sf1 and lost:
    // 1.67 s vs 1.14 s solo same-window — the 7/|resSet| extra probe
    // rows cost more than the collect's one extra driver action saves.)
    val resSet: Array[Int] = cover
      .select(GeoF.h3Resolution(col("cell")).as("r")).distinct()
      .collect().map(_.getInt(0)).sorted
    val zk = col("c_custkey") % 25
    val facts = tbl(s, dir, "customer")
      .select(col("c_custkey").as("fact_id"),
        (zk.cast("double") * 0.5 - 6.0 +
          (((col("c_custkey") * 7919L) % 31).cast("double") - 15.0) * 0.01)
          .as("lat"),
        (zk.cast("double") * 1.5 - 18.0 +
          (((col("c_custkey") * 104729L) % 31).cast("double") - 15.0) * 0.01)
          .as("lng"))
      .select(col("fact_id"),
        GeoF.h3Cell(col("lat"), col("lng"), 6).as("cell6"))
    val probes = facts
      .select(col("fact_id"),
        explode(array(resSet.map(r =>
          GeoF.h3Parent(col("cell6"), lit(r))): _*)).as("cell"))
    probes.join(broadcast(cover), "cell")
      .groupBy(col("zone_id")).agg(count(lit(1)).as("n_facts"))
      .orderBy("zone_id")
  }

  /** h3lib `gridDistance` over the spatial-join candidates: zone pairs
    * whose res-3 cells sit within grid distance 2 (a 2-disk probe
    * equi-join — `x_h3_spatial_join` keeps the 1-disk form), annotated
    * with the EXACT distance ([[GeoF.h3GridDistance]] — flat chart
    * formula through the derived isometries, BFS arm for pentagon
    * pairs; 10 of 25 fixture cells sit in pentagon base cells so both
    * arms run). The proximity-filter primitive when the explode-join
    * shape doesn't fit. Hash-gated since round 12, widened to k = 2 in
    * round 13 ([[H3OracleSql.gridDistance]]): the true distances are
    * exactly {0, 1, 2}, which DuckDB restates from the probe-witnessed
    * adjacency relation — distance 2 as two chained adjacency hops with
    * distances 0/1 excluded first — so the flat-formula arm itself (not
    * just adjacency) is under the hash; exactness on longer paths stays
    * spec-pinned against the traversal ground truth in `H3Spec`. */
  private def h3GridDistanceQ(s: SparkSession, dir: String): DataFrame = {
    val cells = zonesWkt(s, dir)
      .select(col("zone_id"),
        GeoF.h3Cell(
          GeoF.centroidLat(col("zone_geom")),
          GeoF.centroidLng(col("zone_geom")), 3).as("cell"))
    val probes = cells.select(col("zone_id").as("zone_a"),
      col("cell").as("cell_a"),
      explode(GeoF.h3GridDisk(col("cell"), 2)).as("cell"))
    probes
      .join(cells.select(col("zone_id").as("zone_b"), col("cell")), "cell")
      .filter(col("zone_a") < col("zone_b"))
      .select(col("zone_a"), col("zone_b"),
        GeoF.h3GridDistance(col("cell_a"), col("cell")).as("grid_dist"))
      .distinct()
      .orderBy("zone_a", "zone_b", "grid_dist")
  }

  /** h3lib `gridPathCells` (canonicalized min-id greedy — round 14,
    * the last h3lib traversal API): for every 2-disk zone pair, the
    * minimal grid path between their res-3 cells, exploded as
    * (pair, step, cell). Hash-gated by [[H3OracleSql.gridPath]], which
    * REBUILDS the identical path purely from the probe-witnessed
    * adjacency relation (endpoints from anchors, the distance-2 middle
    * cell as the min-id witnessed common neighbor — exactly the greedy
    * candidate rule), so the engine's ring traversal, distance arms,
    * and greedy step all sit under the hash with no H3 code in the
    * oracle. Longer-path laws (length = dist+1, consecutive adjacency,
    * greedy-canonicality vs brute force) are spec-pinned in `H3Spec`. */
  private def h3PathQ(s: SparkSession, dir: String): DataFrame = {
    val cells = zonesWkt(s, dir)
      .select(col("zone_id"),
        GeoF.h3Cell(
          GeoF.centroidLat(col("zone_geom")),
          GeoF.centroidLng(col("zone_geom")), 3).as("cell"))
    val probes = cells.select(col("zone_id").as("zone_a"),
      col("cell").as("cell_a"),
      explode(GeoF.h3GridDisk(col("cell"), 2)).as("cell"))
    probes
      .join(cells.select(col("zone_id").as("zone_b"), col("cell")), "cell")
      .filter(col("zone_a") < col("zone_b"))
      .select(col("zone_a"), col("zone_b"), col("cell_a"),
        col("cell").as("cell_b"))
      .distinct()
      .select(col("zone_a"), col("zone_b"),
        posexplode(GeoF.h3GridPath(col("cell_a"), col("cell_b"))))
      .select(col("zone_a"), col("zone_b"),
        col("pos").cast("int").as("step"), col("col").as("path_cell"))
      .orderBy("zone_a", "zone_b", "step")
  }

  /** h3lib `cellToBoundary` → WKT → back through the engine's OWN WKT
    * surface, under the hash gate since round 12 via CLOSURE columns
    * ([[H3OracleSql.boundary]]): each zone's res-5 cell polygon is
    * built in-plan, then the output exposes (a) the ring's vertex
    * count parsed from the WKT text (7 = closed hexagon) and (b) the
    * planar WKT centroid re-indexed at res 9, which must equal the
    * cell's res-9 digit-0 center-chain descendant — i.e. the boundary
    * centroid must land within ~1% of the cell size from the true
    * center (measured closure depth is 11, H3FixtureDump). A wrong
    * corner, a broken ring, or a shifted unprojection moves the
    * centroid or the comma count and fails the hash. Full corner
    * geometry needs the inverse projection and stays
    * SQL-inexpressible; corner-level laws (neighbor-shared corners,
    * edge-midpoint bijections, and since round 13 the per-face
    * corner-canonicity law with its exactly-enumerated fallback set)
    * are spec-pinned in `H3Spec`. The residual divergences of
    * [[graft.functions.H3.cellToBoundary]] vs h3lib (no distortion
    * vertices; pentagon corners as spherical centroids; the enumerated
    * near-icosahedron-vertex fallback) are documented at its scaladoc
    * and tolerated by this closure gate by construction. */
  private def h3Boundary(s: SparkSession, dir: String): DataFrame =
    zonesWkt(s, dir)
      .select(col("zone_id"),
        GeoF.h3Cell(
          GeoF.centroidLat(col("zone_geom")),
          GeoF.centroidLng(col("zone_geom")), 5).as("cell"))
      .select(col("zone_id"), col("cell"),
        GeoF.h3Boundary(col("cell")).as("boundary"))
      .select(col("zone_id"), col("cell"),
        size(split(col("boundary"), ",")).as("n_pts"),
        GeoF.h3Cell(
          GeoF.centroidLat(col("boundary")),
          GeoF.centroidLng(col("boundary")), 9).as("cell_back9"))
      .orderBy("zone_id")

  /** F5 planar-vs-spherical centroid divergence, MEASURED (round 13,
    * verdict item 5). The reference's enrichment path is
    * `H3_FROMGEOGPOINT(ST_CENTROID(geom), …)` (`enrichment_query.py:
    * 10,17`); BigQuery's ST_CENTROID is spherical while the engine's
    * F5 default is the planar shoelace (exact-analytic on the fixture
    * squares, which is what lets the oracle state it directly). This
    * query indexes BOTH centroids of every fixture zone at res 9 and
    * reports whether the cell flips. Oracle: DuckDB recomputes the
    * spherical centroid independently from the 4 analytic vertices via
    * the published great-circle edge-integral (Σ (a×b)·θ/|a×b| over
    * ring edges) and runs both points through the independent SQL
    * forward — so the WKT parse, the spherical expression, and both H3
    * indexings sit under the hash. MEASURED: 0 of 25 zones flip — the
    * spherical latitude shift of a 0.5° quad is O(Δφ²·tanφ) ≈ 1.8e-4°
    * at the fixture latitudes, about a tenth of a res-9 cell
    * (~1.8e-3° across), so the planar F5 default is res-9-equivalent
    * to BigQuery's spherical ST_CENTROID at these zone sizes. The
    * flip bit stays in the gated output: a polygon large enough (or a
    * res fine enough) to flip would show up here as a hash change,
    * and SURVEY §2.8's F5 note now carries the measured number
    * instead of "can flip". */
  private def centroidSphFlip(s: SparkSession, dir: String): DataFrame =
    zonesWkt(s, dir)
      .select(col("zone_id"),
        GeoF.h3Cell(
          GeoF.centroidLat(col("zone_geom")),
          GeoF.centroidLng(col("zone_geom")), 9).as("cell_planar"),
        GeoF.h3Cell(
          GeoF.centroidSphLat(col("zone_geom")),
          GeoF.centroidSphLng(col("zone_geom")), 9).as("cell_sph"))
      .select(col("zone_id"), col("cell_planar"), col("cell_sph"),
        (col("cell_planar") =!= col("cell_sph")).as("flipped"))
      .orderBy("zone_id")

  val all: Map[String, QueryDef] = Map(
    "f5b_centroid_sph_flip" ->
      QueryDef(centroidSphFlip, Some(H3OracleSql.centroidSphFlip)),
    "x_h3_grid_distance" ->
      QueryDef(h3GridDistanceQ, Some(H3OracleSql.gridDistance)),
    "x_h3_path" -> QueryDef(h3PathQ, Some(H3OracleSql.gridPath)),
    "x_h3_boundary" -> QueryDef(h3Boundary, Some(H3OracleSql.boundary)),
    "x_h3_hierarchy" -> QueryDef(h3Hierarchy, Some(H3OracleSql.hierarchy)),
    "x_h3_compact" -> QueryDef(h3CompactQ, Some(H3OracleSql.compact)),
    "x_h3_uncompact" -> QueryDef(h3UncompactQ, Some(H3OracleSql.uncompact)),
    "x_h3_multires_join" ->
      QueryDef(h3MultiresJoin, Some(H3OracleSql.multiresJoin),
        bench = true,
        benchNote = Some("geo containment chain end-to-end: polyfill -> " +
          "distributed compact -> parent-explode -> equi-join; the DuckDB " +
          "comparator prices the same counts as a point-vs-polygon range " +
          "join, which is what a non-indexed engine pays at scale")),
    "x_h3_polyfill" -> QueryDef(h3Polyfill, Some(H3OracleSql.polyfill)),
    "x_h3_ring" -> QueryDef(h3Ring, Some(H3OracleSql.ring)),
    "x_h3_spatial_join" ->
      QueryDef(h3SpatialJoin, Some(H3OracleSql.spatialJoin)),
    "f5_wkt_centroid" -> QueryDef(wktCentroid, Some(wktCentroidSql)),
    "f6_hex_index" -> QueryDef(hexIndex, Some(H3OracleSql.f6)),
    "x_h3_roundtrip" -> QueryDef(h3Roundtrip, Some(H3OracleSql.f6))
  )
}
