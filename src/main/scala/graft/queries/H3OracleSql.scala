package graft.queries

/** DuckDB oracle for `f6_hex_index` — an INDEPENDENT SQL implementation
  * of H3 `latLngToCell` at res 9 over the fixture zone centroids,
  * authored directly against the published H3 algorithm (icosahedral
  * gnomonic projection → Class III aperture-7 hex grid → digit
  * up-aggregation → base-cell orientation), NOT generated from any
  * engine code path. DuckDB recomputes for itself: the nearest-face
  * argmax, the gnomonic projection and Class III rotation, the exact
  * 4-corner hex rounding, all nine digit-extraction stages, and the
  * full pentagon finishing path (leading-K escape + order-5 pentagon
  * rotations — 10 of the 25 fixture centroids land in pentagon base
  * cells, so that path is genuinely exercised).
  *
  * Shared published constants (the same data both implementations must
  * start from, analogous to sharing π): the 20 face centers/azimuths
  * (H3 `faceijk.c`), the res-0 gnomonic unit (3−√5)/2, and the
  * base-cell orientation table (`faceIjkBaseCells`/`baseCellData`
  * content), embedded in [[H3OracleGen]] as a static 380-row VALUES
  * literal — dumped ONCE from graft's self-checked derivation (122
  * cells / 12 pentagons at the published numbers, end-to-end validated
  * against published H3 vectors in `H3Spec`) and fixed as text. Since
  * round 12 the forward's SQL text is produced by [[H3OracleGen]] at
  * any odd resolution (verified to reproduce the round-10 handwritten
  * res-9 text value-for-value before the swap); the probe-grid oracles
  * below compose it over deterministic point grids. Everything
  * downstream of those constants is independent SQL; a bug in either
  * engine's projection, rounding, digit, or rotation code makes the
  * hashes diverge.
  *
  * Numeric-agreement note: both engines evaluate IEEE-754 doubles; the
  * only operations that may differ in the last ulp are libm
  * transcendentals (tan/acos/atan2/...). A flip would need a centroid
  * within ~1e-12 relative of a res-9 cell boundary — the 25 analytic
  * fixture points sit far from every boundary.
  */
object H3OracleSql {
  /** Zone-centroid points in radians — the shared forward input. */
  private val ptCte: String =
    """pt AS (
      |  SELECT n_nationkey AS zone_id,
      |         (n_nationkey * 0.5 - 6.0) / 180.0 * pi() AS phi,
      |         (n_nationkey * 1.5 - 18.0) / 180.0 * pi() AS lam
      |  FROM nation
      |)""".stripMargin

  val f6: String =
    s"""WITH ${H3OracleGen.constCtes},
       |$ptCte${H3OracleGen.forward("pt", 9, Seq("zone_id"), "fwd")}
       |SELECT zone_id, lower(hex(h)) AS h3_9 FROM fwd ORDER BY zone_id"""
      .stripMargin

  /** `f5b_centroid_sph_flip` (round 13): planar vs spherical centroid of
    * each fixture zone, both indexed at res 9, plus the flip bit. The
    * planar centroid is the analytic zone center; the spherical one is
    * recomputed here INDEPENDENTLY from the 4 analytic ring vertices via
    * the published great-circle edge integral: for consecutive unit
    * vectors a, b the edge contributes (a×b)·θ/|a×b| (θ = arc angle),
    * and the summed vector's direction is the spherical centroid — the
    * fixture rings are counter-clockwise, so the right-hand rule already
    * points the sum into the zone (no hemisphere sign fix needed here;
    * the engine side carries one for arbitrary winding). Both points run
    * through the same independent SQL forward as `f6_hex_index`. */
  val centroidSphFlip: String =
    s"""WITH ${H3OracleGen.constCtes},
       |verts AS (
       |  SELECT n_nationkey AS zone_id, i,
       |         (n_nationkey * 0.5 - 6.0 + dy) / 180.0 * pi() AS vphi,
       |         (n_nationkey * 1.5 - 18.0 + dx) / 180.0 * pi() AS vlam
       |  FROM nation,
       |       (VALUES (0, -0.25, -0.25), (1, 0.25, -0.25),
       |               (2, 0.25, 0.25), (3, -0.25, 0.25)) v(i, dx, dy)
       |),
       |vec AS (
       |  SELECT zone_id, i,
       |         cos(vphi)*cos(vlam) AS x, cos(vphi)*sin(vlam) AS y,
       |         sin(vphi) AS z
       |  FROM verts
       |),
       |edges AS (
       |  SELECT a.zone_id,
       |         a.y*b.z - a.z*b.y AS cx,
       |         a.z*b.x - a.x*b.z AS cy,
       |         a.x*b.y - a.y*b.x AS cz,
       |         a.x*b.x + a.y*b.y + a.z*b.z AS dt
       |  FROM vec a JOIN vec b
       |    ON a.zone_id = b.zone_id AND b.i = (a.i + 1) % 4
       |),
       |sums AS (
       |  SELECT zone_id,
       |         sum(cx * atan2(sqrt(cx*cx+cy*cy+cz*cz), dt)
       |               / sqrt(cx*cx+cy*cy+cz*cz)) AS vx,
       |         sum(cy * atan2(sqrt(cx*cx+cy*cy+cz*cz), dt)
       |               / sqrt(cx*cx+cy*cy+cz*cz)) AS vy,
       |         sum(cz * atan2(sqrt(cx*cx+cy*cy+cz*cz), dt)
       |               / sqrt(cx*cx+cy*cy+cz*cz)) AS vz
       |  FROM edges GROUP BY zone_id
       |),
       |pts AS (
       |  SELECT zone_id, 0 AS kind,
       |         (zone_id * 0.5 - 6.0) / 180.0 * pi() AS phi,
       |         (zone_id * 1.5 - 18.0) / 180.0 * pi() AS lam
       |  FROM sums
       |  UNION ALL
       |  SELECT zone_id, 1 AS kind,
       |         atan2(vz, sqrt(vx*vx + vy*vy)) AS phi,
       |         atan2(vy, vx) AS lam
       |  FROM sums
       |)${H3OracleGen.forward("pts", 9, Seq("zone_id", "kind"), "fc")}
       |SELECT zone_id,
       |       max(CASE WHEN kind = 0 THEN lower(hex(h)) END) AS cell_planar,
       |       max(CASE WHEN kind = 1 THEN lower(hex(h)) END) AS cell_sph,
       |       max(CASE WHEN kind = 0 THEN lower(hex(h)) END)
       |         <> max(CASE WHEN kind = 1 THEN lower(hex(h)) END) AS flipped
       |FROM fc GROUP BY zone_id ORDER BY zone_id""".stripMargin

  // ------------------------------------------------------------------
  // Hierarchy oracles (round 12). The H3 index IS the hierarchy —
  // parent = digit truncation, children = digit enumeration — so once
  // the independent SQL forward above agrees on the res-9 cell, the
  // hierarchy laws are pure 64-bit arithmetic DuckDB re-derives for
  // itself: res field bits 52–55, digit r bits (15−r)·3 .. (15−r)·3+2,
  // unused digits all-ones. The pentagon rule (no leading K digit; a
  // pentagon CELL has 6 children) is restated in SQL from the published
  // spec, sharing only the 12 pentagon base-cell numbers.
  // ------------------------------------------------------------------

  /** Shared prelude: the forward res-9 cell per zone parsed back to a
    * BIGINT, with the pentagon-base flag. */
  private val hierBase: String =
    s"""WITH fwd AS ($f6),
       |base AS (
       |  SELECT zone_id, h3_9,
       |         CAST(CAST('0x' || h3_9 AS UBIGINT) AS BIGINT) AS h
       |  FROM fwd
       |), withp AS (
       |  SELECT zone_id, h3_9, h,
       |         ((h >> 45) & 127) IN (4,14,24,38,49,58,63,72,83,97,107,117)
       |           AS pentbase,
       |         ((h & ~(15::BIGINT << 52)) | (5::BIGINT << 52) |
       |           ((1::BIGINT << 30) - (1::BIGINT << 18))) AS p5,
       |         ((h & ~(15::BIGINT << 52)) | (1::BIGINT << 52) |
       |           ((1::BIGINT << 42) - (1::BIGINT << 18))) AS p1
       |  FROM base
       |)""".stripMargin

  /** `x_h3_hierarchy`: parents at res 5 and 1 by bit truncation, plus
    * the res-7 children count of the res-5 parent (49, or 41 when the
    * parent is a pentagon cell: 1 + 5·(7²−1)/6). */
  val hierarchy: String =
    s"""$hierBase
       |SELECT zone_id, h3_9,
       |       lower(hex(p5)) AS p5,
       |       lower(hex(p1)) AS p1,
       |       CAST(CASE WHEN pentbase AND ((p5 >> 30) & 32767) = 0
       |            THEN 41 ELSE 49 END AS INT) AS n_kids
       |FROM withp ORDER BY zone_id""".stripMargin

  /** Shared child-set construction for the compact/uncompact oracles:
    * every res-7 child (digits d6, d7) of each zone's res-5 parent,
    * minus the deterministic drop rule (both new digits equal
    * zone_id mod 7) that leaves exactly one res-6 sibling set
    * incomplete per zone — so compaction genuinely exercises both a
    * promoted and a surviving level. Pentagon-center paths skip the
    * deleted K axis (digit 1) exactly as the published spec requires. */
  private val keptKids: String =
    s"""$hierBase, c5 AS (
       |  SELECT zone_id, p5 AS c,
       |         pentbase AND ((p5 >> 30) & 32767) = 0 AS pent5
       |  FROM withp
       |), dig(d) AS (VALUES (0),(1),(2),(3),(4),(5),(6)),
       |kids AS (
       |  SELECT zone_id, c, pent5, d6.d AS d6, d7.d AS d7,
       |         ((c & ~(15::BIGINT << 52)
       |             & ~(7::BIGINT << 27) & ~(7::BIGINT << 24)) |
       |           (7::BIGINT << 52) |
       |           (d6.d::BIGINT << 27) | (d7.d::BIGINT << 24)) AS k
       |  FROM c5, dig AS d6, dig AS d7
       |  WHERE NOT (pent5 AND (d6.d = 1 OR (d6.d = 0 AND d7.d = 1)))
       |),
       |kept AS (
       |  SELECT * FROM kids
       |  WHERE NOT (d6 = zone_id % 7 AND d7 = zone_id % 7)
       |)""".stripMargin

  /** `x_h3_uncompact`: uncompact(compact(S)) must equal S — the oracle
    * states S directly (the kept child set). */
  val uncompact: String =
    s"""$keptKids
       |SELECT zone_id, lower(hex(k)) AS cell
       |FROM kept ORDER BY zone_id, cell""".stripMargin

  /** `x_h3_compact`: two compaction levels unrolled in SQL — promote a
    * res-6 parent iff all its kept children are present (7, or 6 for a
    * pentagon-center parent), then likewise res-6 → res-5. Nothing can
    * merge past res 5 here (one res-5 cell per zone scope), so the
    * 2-level unroll IS the full compact of this input. */
  val compact: String =
    s"""$keptKids, marked AS (
       |  SELECT *,
       |         count(*) OVER (PARTITION BY zone_id, d6) AS n6,
       |         CASE WHEN pent5 AND d6 = 0 THEN 6 ELSE 7 END AS e6
       |  FROM kept
       |), surv7 AS (
       |  SELECT zone_id, k AS cell FROM marked WHERE n6 <> e6
       |), prom6 AS (
       |  SELECT DISTINCT zone_id, c, pent5, d6,
       |         (((k | (7::BIGINT << 24)) & ~(15::BIGINT << 52)) |
       |           (6::BIGINT << 52)) AS p6
       |  FROM marked WHERE n6 = e6
       |), m6 AS (
       |  SELECT *,
       |         count(*) OVER (PARTITION BY zone_id) AS n5,
       |         CASE WHEN pent5 THEN 6 ELSE 7 END AS e5
       |  FROM prom6
       |), surv6 AS (
       |  SELECT zone_id, p6 AS cell FROM m6 WHERE n5 <> e5
       |), prom5 AS (
       |  SELECT DISTINCT zone_id, c AS cell FROM m6 WHERE n5 = e5
       |), cover AS (
       |  SELECT * FROM surv7 UNION ALL SELECT * FROM surv6
       |  UNION ALL SELECT * FROM prom5
       |)
       |SELECT zone_id, lower(hex(cell)) AS cell,
       |       CAST((cell >> 52) & 15 AS INT) AS cres
       |FROM cover ORDER BY zone_id, cell""".stripMargin

  /** `x_h3_multires_join`: the fact points are constructed ≥ 0.1° inside
    * their zone's 0.25°-half-width square while a res-6 cell's
    * circumradius is ~0.03°, so every fact's cell CENTER is inside the
    * zone polygon and the polyfill→compact→parent-chain join counts
    * exactly the per-zone fact population. The oracle (since round 12,
    * now also the bench comparator) states that count the way a
    * non-indexed engine would have to: recompute each fact's point and
    * RANGE-JOIN it against every zone polygon — genuine
    * point-in-polygon pricing (the zones are axis-aligned squares, so
    * the polygon test is two interval predicates), no H3 anywhere.
    * Spark's plan instead pays hash-join collision volume on a
    * compacted cell cover; the bench ratio is exactly the
    * "containment priced as hash join" claim, measured. */
  val multiresJoin: String =
    """WITH facts AS (
      |  SELECT c_custkey AS fact_id,
      |         (c_custkey % 25) * 0.5 - 6.0
      |           + (((c_custkey * 7919) % 31) - 15.0) * 0.01 AS lat,
      |         (c_custkey % 25) * 1.5 - 18.0
      |           + (((c_custkey * 104729) % 31) - 15.0) * 0.01 AS lng
      |  FROM customer
      |)
      |SELECT n_nationkey AS zone_id, count(*) AS n_facts
      |FROM facts f JOIN nation n
      |  ON f.lat BETWEEN n_nationkey * 0.5 - 6.25 AND n_nationkey * 0.5 - 5.75
      | AND f.lng BETWEEN n_nationkey * 1.5 - 18.25 AND n_nationkey * 1.5 - 17.75
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // Probe-grid oracles (round 12) for the five formerly rows-only H3
  // queries. The only H3 machinery DuckDB runs is the FORWARD
  // ([[H3OracleGen.forward]]) over deterministic point grids — no
  // traversal, no inverse, no boundary code in SQL. Two reconstruction
  // principles, both engine-independent:
  //
  //  * ADJACENCY (ring / spatial join / grid distance): two cells are
  //    grid-adjacent iff they share an edge, and a fine point grid
  //    crossing that edge yields many adjacent-probe pairs labeled
  //    with the two ids. In a hexagonal tessellation exactly 3 cells
  //    meet at each vertex and all three are pairwise edge-adjacent,
  //    so non-adjacent cells never touch — the nearest "false" pair
  //    (grid distance 2) is separated by an intervening corridor
  //    ≥ 0.03° wide at res 5, vs probe step 0.008°. A ≥3-witness
  //    threshold additionally absorbs any single misrounded probe on
  //    a cell boundary. Shared-edge length ≥ 0.07° at res 5 projects
  //    ≥ 0.05° on one axis → ≥ 6 true witnesses, so no false negative.
  //
  //  * CENTERS (polyfill): the aperture-7 digit-0 child shares its
  //    parent's center EXACTLY, so a probe whose forward id has
  //    digits 6..r all zero lies inside the res-r center-chain cell
  //    of its res-5 ancestor — within one res-r circumradius of that
  //    ancestor's exact center. Staged grids (res 7 discovery, then
  //    res 9/11/13/15 refinement, each grid centered on the previous
  //    stage's witness average) localize every candidate center to
  //    ≤ 6.2e-6°, and each stage classifies cells whose center is
  //    provably inside/outside the zone square at that stage's error
  //    bound, so only boundary-band cells descend.
  // ------------------------------------------------------------------

  /** Zone squares: analytic centers, for probe-grid anchoring. */
  private val zonesCte: String =
    """zones AS (
      |  SELECT n_nationkey AS zone_id,
      |         n_nationkey * 0.5 - 6.0 AS clat,
      |         n_nationkey * 1.5 - 18.0 AS clng
      |  FROM nation
      |)""".stripMargin

  /** Probe grid + forward + adjacency witness at `res`: emits CTEs
    * `adj(c1, c2)` (witnessed edge-adjacent cell pairs, c1 < c2, ≥ 3
    * independent boundary crossings) and `anch(zone_id, anchor)` (each
    * zone centroid's cell — the (0,0) probe, so one forward pass serves
    * both). `delta` is the probe step in degrees, grid [-halfN, halfN]².
    */
  private def adjacencyCtes(res: Int, delta: Double, halfN: Int): String = {
    val psrc = s"psrc$res"
    val out = s"pcell$res"
    s""",
$psrc AS (
  SELECT zone_id, gx, gy,
         (clat + gy*$delta)/180.0*pi() AS phi,
         (clng + gx*$delta)/180.0*pi() AS lam
  FROM zones, range(-$halfN,${halfN + 1}) t1(gx), range(-$halfN,${halfN + 1}) t2(gy)
)${H3OracleGen.forward(psrc, res, Seq("zone_id", "gx", "gy"), out)},
wit AS (
  SELECT least(a.h, b.h) AS c1, greatest(a.h, b.h) AS c2
  FROM $out a JOIN $out b
    ON a.zone_id = b.zone_id AND a.gx + 1 = b.gx AND a.gy = b.gy
  WHERE a.h <> b.h
  UNION ALL
  SELECT least(a.h, b.h), greatest(a.h, b.h)
  FROM $out a JOIN $out b
    ON a.zone_id = b.zone_id AND a.gx = b.gx AND a.gy + 1 = b.gy
  WHERE a.h <> b.h
),
adj AS (SELECT c1, c2 FROM wit GROUP BY c1, c2 HAVING count(*) >= 3),
anch AS (SELECT zone_id, h AS anchor FROM $out WHERE gx = 0 AND gy = 0)"""
  }

  /** `x_h3_ring`: each zone's res-5 cell and its full 1-disk — the
    * disk is the anchor plus every witnessed-adjacent cell. Probe step
    * 0.008° vs min cell edge ~0.072° (measured 0.0719–0.0893 across
    * fixture zones); grid half-extent 44·0.008 = 0.352° covers anchor
    * center offset (≤ 0.09°) + neighbor spacing (≤ 0.155°) + neighbor
    * circumradius (≤ 0.09°). */
  val ring: String =
    s"""WITH ${H3OracleGen.constCtes},
       |$zonesCte${adjacencyCtes(5, 0.008, 44)},
       |ringm AS (
       |  SELECT zone_id, anchor, anchor AS member FROM anch
       |  UNION ALL
       |  SELECT zone_id, anchor, c2 FROM anch JOIN adj ON c1 = anchor
       |  UNION ALL
       |  SELECT zone_id, anchor, c1 FROM anch JOIN adj ON c2 = anchor
       |)
       |SELECT zone_id, lower(hex(anchor)) AS cell,
       |       lower(hex(member)) AS ring_cell
       |FROM ringm ORDER BY zone_id, ring_cell""".stripMargin

  /** Zone pairs whose res-3 cells are identical or witnessed-adjacent —
    * shared by `x_h3_spatial_join` (pair list) and `x_h3_grid_distance`
    * (pair + 0/1 distance). Res-3 cells: edge ≥ ~0.5°, step 0.05°,
    * half-extent 2.5° covers each anchor's full 1-ring. */
  private def res3Pairs(select: String): String =
    s"""WITH ${H3OracleGen.constCtes},
       |$zonesCte${adjacencyCtes(3, 0.05, 50)},
       |pairs AS (
       |  SELECT a.zone_id AS zone_a, b.zone_id AS zone_b,
       |         CASE WHEN a.anchor = b.anchor THEN 0 ELSE 1 END AS grid_dist
       |  FROM anch a JOIN anch b ON a.zone_id < b.zone_id
       |  WHERE a.anchor = b.anchor
       |     OR EXISTS (SELECT 1 FROM adj
       |                WHERE c1 = least(a.anchor, b.anchor)
       |                  AND c2 = greatest(a.anchor, b.anchor))
       |)
       |$select FROM pairs ORDER BY zone_a, zone_b""".stripMargin

  /** `x_h3_spatial_join`. */
  val spatialJoin: String = res3Pairs("SELECT zone_a, zone_b")

  /** `x_h3_grid_distance`: the query emits the engine's
    * [[graft.functions.H3.gridDistance]] on each 2-disk candidate pair
    * (round 13 — the round-12 form was 1-disk, so the gate only ever
    * stated distances {0, 1} and barely constrained the flat formula
    * beyond adjacency). True distances here are {0, 1, 2}, restated
    * engine-independently from the probe-witnessed adjacency relation:
    * 0 = same anchor, 1 = witnessed-adjacent, 2 = a chain of two
    * witnessed hops with 0/1 excluded first (a length-2 chain bounds
    * the distance above by 2, and the exclusion bounds it below). The
    * mid cell of any true distance-2 pair lies within ~1.5° of both
    * zone centroids at res 3 (anchors ≤ 2 center spacings ≈ 2° apart,
    * spacing 0.87–1°), well inside each zone's 2.5° probe half-extent,
    * so both hops are always witnessed and the chain test has no false
    * negatives; the union over zones of per-zone grids supplies both
    * edges. */
  val gridDistance: String =
    s"""WITH ${H3OracleGen.constCtes},
       |$zonesCte${adjacencyCtes(3, 0.05, 50)},
       |und AS (
       |  SELECT c1 AS a, c2 AS b FROM adj
       |  UNION ALL
       |  SELECT c2 AS a, c1 AS b FROM adj
       |),
       |cand AS (
       |  SELECT a.zone_id AS zone_a, b.zone_id AS zone_b,
       |         a.anchor AS anch_a, b.anchor AS anch_b
       |  FROM anch a JOIN anch b ON a.zone_id < b.zone_id
       |),
       |pairs AS (
       |  SELECT zone_a, zone_b,
       |         CASE
       |           WHEN anch_a = anch_b THEN 0
       |           WHEN EXISTS (SELECT 1 FROM adj
       |                        WHERE c1 = least(anch_a, anch_b)
       |                          AND c2 = greatest(anch_a, anch_b))
       |             THEN 1
       |           WHEN EXISTS (SELECT 1 FROM und u1
       |                        JOIN und u2 ON u1.b = u2.a
       |                        WHERE u1.a = anch_a AND u2.b = anch_b)
       |             THEN 2
       |         END AS grid_dist
       |  FROM cand
       |)
       |SELECT zone_a, zone_b, CAST(grid_dist AS INT) AS grid_dist
       |FROM pairs WHERE grid_dist IS NOT NULL
       |ORDER BY zone_a, zone_b""".stripMargin

  /** `x_h3_path` (round 14): the engine emits, for each 2-disk zone
    * pair, the CANONICAL minimal grid path (min-id greedy — see
    * [[graft.functions.H3.gridPathCells]]; h3lib disclaims which
    * minimal path its own gridPathCells returns, so the deterministic
    * canonical form is what an independent oracle can restate). The
    * oracle rebuilds the identical path from the probe-witnessed
    * adjacency relation alone: step 0 is anch_a, the last step is
    * anch_b, and a distance-2 pair's middle cell is the MINIMUM id
    * among witnessed common neighbors — exactly the engine's greedy
    * choice, since its step-1 candidate set for a distance-2 pair is
    * "neighbors of a adjacent to b". Witness completeness for EVERY
    * common neighbor (not just one chain) holds by the same corridor
    * geometry as the gridDistance oracle: any common neighbor sits
    * within one center spacing (≈1°) of both anchors, so both of its
    * shared edges lie well inside the 2.5° probe half-extents of the
    * two zones' grids. */
  val gridPath: String =
    s"""WITH ${H3OracleGen.constCtes},
       |$zonesCte${adjacencyCtes(3, 0.05, 50)},
       |und AS (
       |  SELECT c1 AS a, c2 AS b FROM adj
       |  UNION ALL
       |  SELECT c2 AS a, c1 AS b FROM adj
       |),
       |cand AS (
       |  SELECT a.zone_id AS zone_a, b.zone_id AS zone_b,
       |         a.anchor AS anch_a, b.anchor AS anch_b
       |  FROM anch a JOIN anch b ON a.zone_id < b.zone_id
       |),
       |pairs AS (
       |  SELECT zone_a, zone_b, anch_a, anch_b,
       |         CASE
       |           WHEN anch_a = anch_b THEN 0
       |           WHEN EXISTS (SELECT 1 FROM adj
       |                        WHERE c1 = least(anch_a, anch_b)
       |                          AND c2 = greatest(anch_a, anch_b))
       |             THEN 1
       |           WHEN EXISTS (SELECT 1 FROM und u1
       |                        JOIN und u2 ON u1.b = u2.a
       |                        WHERE u1.a = anch_a AND u2.b = anch_b)
       |             THEN 2
       |         END AS grid_dist
       |  FROM cand
       |),
       |steps AS (
       |  SELECT zone_a, zone_b, 0 AS step, anch_a AS cell
       |  FROM pairs WHERE grid_dist IS NOT NULL
       |  UNION ALL
       |  SELECT zone_a, zone_b, grid_dist AS step, anch_b AS cell
       |  FROM pairs WHERE grid_dist >= 1
       |  UNION ALL
       |  SELECT p.zone_a, p.zone_b, 1 AS step,
       |         (SELECT min(u1.b) FROM und u1 JOIN und u2 ON u1.b = u2.a
       |          WHERE u1.a = p.anch_a AND u2.b = p.anch_b) AS cell
       |  FROM pairs p WHERE grid_dist = 2
       |)
       |SELECT zone_a, zone_b, CAST(step AS INT) AS step,
       |       lower(hex(cell)) AS path_cell
       |FROM steps ORDER BY zone_a, zone_b, step""".stripMargin

  // Staged polyfill refinement parameters. Measured fixture res-5 cell
  // geometry: center spacing 0.1246–0.1545° → edge (= circumradius)
  // 0.0719–0.0893°; bounds widened ~10% to eMin5 = 0.0635, eMax5 =
  // 0.0982 before deriving the stage constants. Per refinement stage
  // (res r): probe step δr = 1.1·eMin(r) (a hexagon of inradius
  // 0.866·eMin always contains a grid point at step ≤ 1.2247·eMin);
  // classification error bound errR = 1.05·eMax(r) (witness average
  // lies within one circumradius of the true center). A 25×25 grid at
  // δr spans ±13.2·eMin(r), covering the previous estimate error
  // (7·eMax = 10.8·eMin) plus the center cell itself (1.55·eMin) plus
  // the in-ball guarantee. Final localization ≤ 1.05·eMax(15) =
  // 6.2e-6°; the measured minimum center-to-zone-boundary margin over
  // all fixture candidate cells is 4.3e-5° (H3FixtureDump, spec-pinned
  // in H3Spec), a 7× margin — the classification at res 15 is
  // therefore exact for these fixtures, and that reliance is the
  // documented condition of this oracle.
  private val d7 = 0.009979
  private val dRef = Map(9 -> 1.4255e-3, 11 -> 2.0364e-4,
    13 -> 2.9092e-5, 15 -> 4.156e-6)
  private val errAt = Map(7 -> 0.014730, 9 -> 0.0021043,
    11 -> 3.0061e-4, 13 -> 4.2944e-5)

  /** Bits of digits 6..r (the digit-0-chain witness mask). */
  private def chainMask(r: Int): Long = (1L << 30) - (1L << (3 * (15 - r)))

  private def inUncCtes(r: Int): String = {
    val e = errAt(r)
    s""",
in$r AS (
  SELECT e.zone_id, e.cell FROM est$r e JOIN zones z USING (zone_id)
  WHERE elat > z.clat - 0.25 + $e AND elat < z.clat + 0.25 - $e
    AND elng > z.clng - 0.25 + $e AND elng < z.clng + 0.25 - $e
),
unc$r AS MATERIALIZED (
  SELECT e.zone_id, e.cell, e.elat, e.elng
  FROM est$r e JOIN zones z USING (zone_id)
  WHERE NOT (elat > z.clat - 0.25 + $e AND elat < z.clat + 0.25 - $e
         AND elng > z.clng - 0.25 + $e AND elng < z.clng + 0.25 - $e)
    AND NOT (elat < z.clat - 0.25 - $e OR elat > z.clat + 0.25 + $e
          OR elng < z.clng - 0.25 - $e OR elng > z.clng + 0.25 + $e)
)"""
  }

  /** `x_h3_polyfill`: every res-5 cell whose center lies inside the
    * zone square, reconstructed with no inverse projection in SQL —
    * discovery probes the square (+0.03° margin, covering any center
    * cell that could be inside) at res 7, then uncertain cells refine
    * through res 9/11/13/15 center-chain witnesses. See the stage
    * constants above for the error-bound accounting. */
  val polyfill: String = {
    val sb = new StringBuilder
    sb ++= s"""WITH ${H3OracleGen.constCtes},
$zonesCte,
dsrc AS (
  SELECT zone_id, clat + gy*$d7 AS plat, clng + gx*$d7 AS plng,
         (clat + gy*$d7)/180.0*pi() AS phi,
         (clng + gx*$d7)/180.0*pi() AS lam
  FROM zones, range(-29,30) t1(gx), range(-29,30) t2(gy)
)${H3OracleGen.forward("dsrc", 7, Seq("zone_id", "plat", "plng"), "dcell")},
est7 AS MATERIALIZED (
  SELECT zone_id,
         ((h & ~(15::BIGINT << 52)) | (5::BIGINT << 52) | ${chainMask(7)}) AS cell,
         avg(plat) AS elat, avg(plng) AS elng
  FROM dcell
  WHERE (h & ${chainMask(7)}) = 0
  GROUP BY 1, 2
)${inUncCtes(7)}"""
    var prevUnc = "unc7"
    for (r <- Seq(9, 11, 13, 15)) {
      val dl = dRef(r)
      sb ++= s""",
src$r AS (
  SELECT zone_id, cell, elat + gy*$dl AS plat, elng + gx*$dl AS plng,
         (elat + gy*$dl)/180.0*pi() AS phi, (elng + gx*$dl)/180.0*pi() AS lam
  FROM $prevUnc, range(-12,13) t1(gx), range(-12,13) t2(gy)
)${H3OracleGen.forward(s"src$r", r, Seq("zone_id", "cell", "plat", "plng"), s"cell$r")},
est$r AS MATERIALIZED (
  SELECT zone_id, cell, avg(plat) AS elat, avg(plng) AS elng
  FROM cell$r
  WHERE (h & ${chainMask(r)}) = 0
    AND ((h & ~(15::BIGINT << 52)) | (5::BIGINT << 52) | ${chainMask(r)}) = cell
  GROUP BY zone_id, cell
)"""
      if (r < 15) { sb ++= inUncCtes(r); prevUnc = s"unc$r" }
    }
    sb ++= s""",
in15 AS (
  SELECT e.zone_id, e.cell FROM est15 e JOIN zones z USING (zone_id)
  WHERE elat > z.clat - 0.25 AND elat < z.clat + 0.25
    AND elng > z.clng - 0.25 AND elng < z.clng + 0.25
),
allin AS (
  SELECT * FROM in7 UNION ALL SELECT * FROM in9 UNION ALL
  SELECT * FROM in11 UNION ALL SELECT * FROM in13 UNION ALL
  SELECT * FROM in15
)
SELECT zone_id, lower(hex(cell)) AS cell
FROM allin ORDER BY zone_id, cell"""
    sb.toString
  }

  /** `st_h3_enrich` oracle — the streaming H3 enrichment's batch
    * answer: each event's synthetic point (deterministic per
    * `user_id % 150`, so the forward runs over ≤150 distinct points at
    * any scale factor; ~40% land in pentagon base cells) is indexed at
    * res 7 by the independent SQL forward, then events aggregate per
    * cell. The streaming side computes the identical degree formulas
    * column-wise and indexes in-stream through the codegen H3
    * expression — stream/batch unification checked through the full
    * geo path, not just time windows. */
  val streamEnrich: String =
    s"""WITH ${H3OracleGen.constCtes},
       |ks AS (SELECT DISTINCT user_id % 150 AS ukey FROM events),
       |pts AS (
       |  SELECT ukey,
       |         ((ukey % 25) * 0.5 - 6.0
       |           + (((ukey * 7919) % 97) - 48) * 0.004) / 180.0 * pi() AS phi,
       |         ((ukey % 25) * 1.5 - 18.0
       |           + (((ukey * 104729) % 97) - 48) * 0.004) / 180.0 * pi() AS lam
       |  FROM ks
       |)${H3OracleGen.forward("pts", 7, Seq("ukey"), "kc")},
       |ev AS (SELECT user_id % 150 AS ukey, value FROM events)
       |SELECT lower(hex(kc.h)) AS cell, count(*) AS n_events,
       |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM ev JOIN kc USING (ukey)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** `x_h3_boundary` closure oracle: the query emits each zone cell's
    * boundary vertex count (parsed from the WKT text) and the re-index
    * of the boundary's planar centroid at res 9. The oracle restates
    * both from the forward alone: a hexagon ring closes with 7 points
    * (6 for a true pentagon cell — none among the fixtures, but stated
    * conditionally anyway), and the centroid must land in the res-9
    * digit-0 center-chain descendant of the cell — measured closure
    * depth is 11 for every fixture zone (H3FixtureDump), so res 9
    * carries ~50× margin while still requiring the boundary centroid
    * to sit within ~1% of the cell size from the true center. Full
    * corner geometry is genuinely SQL-inexpressible here (it needs the
    * inverse projection); the closure columns are the oracle-able
    * surface, per the round-11 verdict's explicit allowance. */
  val boundary: String =
    s"""WITH ${H3OracleGen.constCtes},
       |$ptCte${H3OracleGen.forward("pt", 5, Seq("zone_id"), "fwd")}
       |SELECT zone_id, lower(hex(h)) AS cell,
       |       CAST(CASE WHEN ((h >> 45) & 127) IN
       |                   (4,14,24,38,49,58,63,72,83,97,107,117)
       |                  AND (h & ${(1L << 45) - (1L << 30)}) = 0
       |            THEN 6 ELSE 7 END AS INT) AS n_pts,
       |       lower(hex((h & ~(15::BIGINT << 52) & ~${chainMask(9)})
       |                 | (9::BIGINT << 52))) AS cell_back9
       |FROM fwd ORDER BY zone_id""".stripMargin
}
