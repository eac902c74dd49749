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
  * content), embedded below as a static 380-row VALUES literal — dumped
  * ONCE from graft's self-checked derivation (122 cells / 12 pentagons
  * at the published numbers, end-to-end validated against published H3
  * vectors in `H3Spec`) and pasted here as fixed text. Everything
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
  val f6: String =
    """WITH pt AS (
      |  SELECT n_nationkey AS zone_id,
      |         (n_nationkey * 0.5 - 6.0) / 180.0 * pi() AS phi,
      |         (n_nationkey * 1.5 - 18.0) / 180.0 * pi() AS lam
      |  FROM nation
      |), faces(f, flat, flng, faz) AS (VALUES
      |    (0, 0.80358264971899, 1.2483974196173961, 5.6199582685239395),
      |    (1, 1.3077478834556382, 2.5369450098779214, 5.7603390817141875),
      |    (2, 1.054751253523952, -1.3475173589003966, 0.78021365439343),
      |    (3, 0.6001915955381868, -0.45060390946975576, 0.4304693639799999),
      |    (4, 0.49171542819877384, 0.40198820291130694, 6.130269123335111),
      |    (5, 0.1727453274156187, 1.6781468852804338, 2.692877706530643),
      |    (6, 0.6059293215713507, 2.9539233298124117, 2.982963003477244),
      |    (7, 0.42737051832897965, -1.8888762003362853, 3.532912002790141),
      |    (8, -0.07906611854921283, -0.7334295133808677, 3.494305004259568),
      |    (9, -0.23096164445538364, 0.506495587332349, 3.0032141694995382),
      |    (10, 0.07906611854921283, 2.4081631402089254, 5.930472956509812),
      |    (11, 0.23096164445538364, -2.635097066257444, 0.13837848409025486),
      |    (12, -0.1727453274156187, -1.4634457683093596, 0.4487149470591504),
      |    (13, -0.6059293215713507, -0.18766932377738163, 0.15862965011254937),
      |    (14, -0.42737051832897965, 1.2527164532535078, 5.891865957979238),
      |    (15, -0.6001915955381868, 2.6909887441200375, 2.711123289609793),
      |    (16, -0.49171542819877384, -2.7396044506784865, 3.294508837434268),
      |    (17, -0.80358264971899, -1.8931952339723972, 3.80481969224544),
      |    (18, -1.3077478834556382, -0.6046476437118721, 3.6644388790551923),
      |    (19, -1.054751253523952, 1.7940752946893965, 2.361378999196363)
      |), bctab(bf, bi, bj, bk, bc, brot, bpent, bcw) AS (VALUES
      |    (0,0,0,0,16,0,0,0), (0,0,0,1,18,0,0,0), (0,0,0,2,24,0,1,0), (0,0,1,0,33,0,0,0), (0,0,1,1,30,0,0,0), (0,0,1,2,32,3,0,0),
      |    (0,0,2,0,49,1,1,1), (0,0,2,1,48,3,0,0), (0,0,2,2,50,3,0,0), (0,1,0,0,8,0,0,0), (0,1,0,1,5,0,0,0), (0,1,0,2,10,5,0,0),
      |    (0,1,1,0,22,0,0,0), (0,1,2,0,41,1,0,0), (0,2,0,0,4,0,1,0), (0,2,0,1,0,5,0,0), (0,2,0,2,2,5,0,0), (0,2,1,0,15,1,0,0),
      |    (0,2,2,0,31,1,0,0), (1,0,0,0,2,0,0,0), (1,0,0,1,6,0,0,0), (1,0,0,2,14,0,1,0), (1,0,1,0,10,0,0,0), (1,0,1,1,11,0,0,0),
      |    (1,0,1,2,17,3,0,0), (1,0,2,0,24,1,1,1), (1,0,2,1,23,3,0,0), (1,0,2,2,25,3,0,0), (1,1,0,0,0,0,0,0), (1,1,0,1,1,0,0,0),
      |    (1,1,0,2,9,5,0,0), (1,1,1,0,5,1,0,0), (1,1,2,0,18,1,0,0), (1,2,0,0,4,1,1,0), (1,2,0,1,3,5,0,0), (1,2,0,2,7,5,0,0),
      |    (1,2,1,0,8,1,0,0), (1,2,2,0,16,1,0,0), (2,0,0,0,7,0,0,0), (2,0,0,1,21,0,0,0), (2,0,0,2,38,0,1,0), (2,0,1,0,9,0,0,0),
      |    (2,0,1,1,19,0,0,0), (2,0,1,2,34,3,0,0), (2,0,2,0,14,1,1,1), (2,0,2,1,20,3,0,0), (2,0,2,2,36,3,0,0), (2,1,0,0,3,0,0,0),
      |    (2,1,0,1,13,0,0,0), (2,1,0,2,29,5,0,0), (2,1,1,0,1,1,0,0), (2,1,2,0,6,1,0,0), (2,2,0,0,4,2,1,0), (2,2,0,1,12,5,0,0),
      |    (2,2,0,2,26,5,0,0), (2,2,1,0,0,1,0,0), (2,2,2,0,2,1,0,0), (3,0,0,0,26,0,0,0), (3,0,0,1,42,0,0,0), (3,0,0,2,58,0,1,0),
      |    (3,0,1,0,29,0,0,0), (3,0,1,1,43,0,0,0), (3,0,1,2,62,3,0,0), (3,0,2,0,38,1,1,1), (3,0,2,1,47,3,0,0), (3,0,2,2,64,3,0,0),
      |    (3,1,0,0,12,0,0,0), (3,1,0,1,28,0,0,0), (3,1,0,2,44,5,0,0), (3,1,1,0,13,1,0,0), (3,1,2,0,21,1,0,0), (3,2,0,0,4,3,1,0),
      |    (3,2,0,1,15,5,0,0), (3,2,0,2,31,5,0,0), (3,2,1,0,3,1,0,0), (3,2,2,0,7,1,0,0), (4,0,0,0,31,0,0,0), (4,0,0,1,41,0,0,0),
      |    (4,0,0,2,49,0,1,0), (4,0,1,0,44,0,0,0), (4,0,1,1,53,0,0,0), (4,0,1,2,61,3,0,0), (4,0,2,0,58,1,1,1), (4,0,2,1,65,3,0,0),
      |    (4,0,2,2,75,3,0,0), (4,1,0,0,15,0,0,0), (4,1,0,1,22,5,0,0), (4,1,0,2,33,5,0,0), (4,1,1,0,28,1,0,0), (4,1,2,0,42,1,0,0),
      |    (4,2,0,0,4,4,1,0), (4,2,0,1,8,5,0,0), (4,2,0,2,16,5,0,0), (4,2,1,0,12,1,0,0), (4,2,2,0,26,1,0,0), (5,0,0,0,50,0,0,0),
      |    (5,0,0,1,48,0,0,0), (5,0,0,2,49,3,1,0), (5,0,1,0,32,0,0,0), (5,0,1,1,30,3,0,0), (5,0,1,2,33,3,0,0), (5,0,2,0,24,3,1,1),
      |    (5,0,2,1,18,3,0,0), (5,0,2,2,16,3,0,0), (5,1,0,0,70,0,0,0), (5,1,0,1,67,0,0,0), (5,1,0,2,66,3,0,0), (5,1,1,0,52,0,0,0),
      |    (5,1,2,0,37,3,0,0), (5,2,0,0,83,0,1,0), (5,2,0,1,87,3,0,0), (5,2,0,2,85,3,0,0), (5,2,1,0,74,3,0,0), (5,2,2,0,57,3,0,0),
      |    (6,0,0,0,25,0,0,0), (6,0,0,1,23,0,0,0), (6,0,0,2,24,3,1,0), (6,0,1,0,17,0,0,0), (6,0,1,1,11,3,0,0), (6,0,1,2,10,3,0,0),
      |    (6,0,2,0,14,3,1,1), (6,0,2,1,6,3,0,0), (6,0,2,2,2,3,0,0), (6,1,0,0,45,0,0,0), (6,1,0,1,39,0,0,0), (6,1,0,2,37,3,0,0),
      |    (6,1,1,0,35,0,0,0), (6,1,2,0,27,3,0,0), (6,2,0,0,63,0,1,0), (6,2,0,1,59,3,0,0), (6,2,0,2,57,3,0,0), (6,2,1,0,56,3,0,0),
      |    (6,2,2,0,46,3,0,0), (7,0,0,0,36,0,0,0), (7,0,0,1,20,0,0,0), (7,0,0,2,14,3,1,0), (7,0,1,0,34,0,0,0), (7,0,1,1,19,3,0,0),
      |    (7,0,1,2,9,3,0,0), (7,0,2,0,38,3,1,1), (7,0,2,1,21,3,0,0), (7,0,2,2,7,3,0,0), (7,1,0,0,55,0,0,0), (7,1,0,1,40,0,0,0),
      |    (7,1,0,2,27,3,0,0), (7,1,1,0,54,0,0,0), (7,1,2,0,51,3,0,0), (7,2,0,0,72,0,1,0), (7,2,0,1,60,3,0,0), (7,2,0,2,46,3,0,0),
      |    (7,2,1,0,73,3,0,0), (7,2,2,0,71,3,0,0), (8,0,0,0,64,0,0,0), (8,0,0,1,47,0,0,0), (8,0,0,2,38,3,1,0), (8,0,1,0,62,0,0,0),
      |    (8,0,1,1,43,3,0,0), (8,0,1,2,29,3,0,0), (8,0,2,0,58,3,1,1), (8,0,2,1,42,3,0,0), (8,0,2,2,26,3,0,0), (8,1,0,0,84,0,0,0),
      |    (8,1,0,1,69,0,0,0), (8,1,0,2,51,3,0,0), (8,1,1,0,82,0,0,0), (8,1,2,0,76,3,0,0), (8,2,0,0,97,0,1,0), (8,2,0,1,89,3,0,0),
      |    (8,2,0,2,71,3,0,0), (8,2,1,0,98,3,0,0), (8,2,2,0,96,3,0,0), (9,0,0,0,75,0,0,0), (9,0,0,1,65,0,0,0), (9,0,0,2,58,3,1,0),
      |    (9,0,1,0,61,0,0,0), (9,0,1,1,53,3,0,0), (9,0,1,2,44,3,0,0), (9,0,2,0,49,3,1,1), (9,0,2,1,41,3,0,0), (9,0,2,2,31,3,0,0),
      |    (9,1,0,0,94,0,0,0), (9,1,0,1,86,0,0,0), (9,1,0,2,76,3,0,0), (9,1,1,0,81,0,0,0), (9,1,2,0,66,3,0,0), (9,2,0,0,107,0,1,0),
      |    (9,2,0,1,104,3,0,0), (9,2,0,2,96,3,0,0), (9,2,1,0,101,3,0,0), (9,2,2,0,85,3,0,0), (10,0,0,0,57,0,0,0), (10,0,0,1,59,0,0,0),
      |    (10,0,0,2,63,3,1,0), (10,0,1,0,74,0,0,0), (10,0,1,1,78,0,0,0), (10,0,1,2,79,3,0,0), (10,0,2,0,83,3,1,1), (10,0,2,1,92,3,0,0),
      |    (10,0,2,2,95,3,0,0), (10,1,0,0,37,0,0,0), (10,1,0,1,39,3,0,0), (10,1,0,2,45,3,0,0), (10,1,1,0,52,3,0,0), (10,1,2,0,70,3,0,0),
      |    (10,2,0,0,24,0,1,0), (10,2,0,1,23,3,0,0), (10,2,0,2,25,3,0,0), (10,2,1,0,32,3,0,0), (10,2,2,0,50,3,0,0), (11,0,0,0,46,0,0,0),
      |    (11,0,0,1,60,0,0,0), (11,0,0,2,72,3,1,0), (11,0,1,0,56,0,0,0), (11,0,1,1,68,0,0,0), (11,0,1,2,80,3,0,0), (11,0,2,0,63,3,1,1),
      |    (11,0,2,1,77,3,0,0), (11,0,2,2,90,3,0,0), (11,1,0,0,27,0,0,0), (11,1,0,1,40,3,0,0), (11,1,0,2,55,3,0,0), (11,1,1,0,35,3,0,0),
      |    (11,1,2,0,45,3,0,0), (11,2,0,0,14,0,1,0), (11,2,0,1,20,3,0,0), (11,2,0,2,36,3,0,0), (11,2,1,0,17,3,0,0), (11,2,2,0,25,3,0,0),
      |    (12,0,0,0,71,0,0,0), (12,0,0,1,89,0,0,0), (12,0,0,2,97,3,1,0), (12,0,1,0,73,0,0,0), (12,0,1,1,91,0,0,0), (12,0,1,2,103,3,0,0),
      |    (12,0,2,0,72,3,1,1), (12,0,2,1,88,3,0,0), (12,0,2,2,105,3,0,0), (12,1,0,0,51,0,0,0), (12,1,0,1,69,3,0,0), (12,1,0,2,84,3,0,0),
      |    (12,1,1,0,54,3,0,0), (12,1,2,0,55,3,0,0), (12,2,0,0,38,0,1,0), (12,2,0,1,47,3,0,0), (12,2,0,2,64,3,0,0), (12,2,1,0,34,3,0,0),
      |    (12,2,2,0,36,3,0,0), (13,0,0,0,96,0,0,0), (13,0,0,1,104,0,0,0), (13,0,0,2,107,3,1,0), (13,0,1,0,98,0,0,0), (13,0,1,1,110,0,0,0),
      |    (13,0,1,2,115,3,0,0), (13,0,2,0,97,3,1,1), (13,0,2,1,111,3,0,0), (13,0,2,2,119,3,0,0), (13,1,0,0,76,0,0,0), (13,1,0,1,86,3,0,0),
      |    (13,1,0,2,94,3,0,0), (13,1,1,0,82,3,0,0), (13,1,2,0,84,3,0,0), (13,2,0,0,58,0,1,0), (13,2,0,1,65,3,0,0), (13,2,0,2,75,3,0,0),
      |    (13,2,1,0,62,3,0,0), (13,2,2,0,64,3,0,0), (14,0,0,0,85,0,0,0), (14,0,0,1,87,0,0,0), (14,0,0,2,83,3,1,0), (14,0,1,0,101,0,0,0),
      |    (14,0,1,1,102,0,0,0), (14,0,1,2,100,3,0,0), (14,0,2,0,107,3,1,1), (14,0,2,1,112,3,0,0), (14,0,2,2,114,3,0,0), (14,1,0,0,66,0,0,0),
      |    (14,1,0,1,67,3,0,0), (14,1,0,2,70,3,0,0), (14,1,1,0,81,3,0,0), (14,1,2,0,94,3,0,0), (14,2,0,0,49,0,1,0), (14,2,0,1,48,3,0,0),
      |    (14,2,0,2,50,3,0,0), (14,2,1,0,61,3,0,0), (14,2,2,0,75,3,0,0), (15,0,0,0,95,0,0,0), (15,0,0,1,92,0,0,0), (15,0,0,2,83,0,1,0),
      |    (15,0,1,0,79,0,0,0), (15,0,1,1,78,3,0,0), (15,0,1,2,74,3,0,0), (15,0,2,0,63,1,1,1), (15,0,2,1,59,3,0,0), (15,0,2,2,57,3,0,0),
      |    (15,1,0,0,109,0,0,0), (15,1,0,1,108,0,0,0), (15,1,0,2,100,5,0,0), (15,1,1,0,93,0,0,0), (15,1,2,0,77,1,0,0), (15,2,0,0,117,0,1,0),
      |    (15,2,0,1,118,5,0,0), (15,2,0,2,114,5,0,0), (15,2,1,0,106,1,0,0), (15,2,2,0,90,1,0,0), (16,0,0,0,90,0,0,0), (16,0,0,1,77,0,0,0),
      |    (16,0,0,2,63,0,1,0), (16,0,1,0,80,0,0,0), (16,0,1,1,68,3,0,0), (16,0,1,2,56,3,0,0), (16,0,2,0,72,1,1,1), (16,0,2,1,60,3,0,0),
      |    (16,0,2,2,46,3,0,0), (16,1,0,0,106,0,0,0), (16,1,0,1,93,5,0,0), (16,1,0,2,79,5,0,0), (16,1,1,0,99,0,0,0), (16,1,2,0,88,1,0,0),
      |    (16,2,0,0,117,4,1,0), (16,2,0,1,109,5,0,0), (16,2,0,2,95,5,0,0), (16,2,1,0,113,1,0,0), (16,2,2,0,105,1,0,0), (17,0,0,0,105,0,0,0),
      |    (17,0,0,1,88,0,0,0), (17,0,0,2,72,0,1,0), (17,0,1,0,103,0,0,0), (17,0,1,1,91,3,0,0), (17,0,1,2,73,3,0,0), (17,0,2,0,97,1,1,1),
      |    (17,0,2,1,89,3,0,0), (17,0,2,2,71,3,0,0), (17,1,0,0,113,0,0,0), (17,1,0,1,99,5,0,0), (17,1,0,2,80,5,0,0), (17,1,1,0,116,0,0,0),
      |    (17,1,2,0,111,1,0,0), (17,2,0,0,117,3,1,0), (17,2,0,1,106,5,0,0), (17,2,0,2,90,5,0,0), (17,2,1,0,121,1,0,0), (17,2,2,0,119,1,0,0),
      |    (18,0,0,0,119,0,0,0), (18,0,0,1,111,0,0,0), (18,0,0,2,97,0,1,0), (18,0,1,0,115,0,0,0), (18,0,1,1,110,3,0,0), (18,0,1,2,98,3,0,0),
      |    (18,0,2,0,107,1,1,1), (18,0,2,1,104,3,0,0), (18,0,2,2,96,3,0,0), (18,1,0,0,121,0,0,0), (18,1,0,1,116,5,0,0), (18,1,0,2,103,5,0,0),
      |    (18,1,1,0,120,0,0,0), (18,1,2,0,112,1,0,0), (18,2,0,0,117,2,1,0), (18,2,0,1,113,5,0,0), (18,2,0,2,105,5,0,0), (18,2,1,0,118,1,0,0),
      |    (18,2,2,0,114,1,0,0), (19,0,0,0,114,0,0,0), (19,0,0,1,112,0,0,0), (19,0,0,2,107,0,1,0), (19,0,1,0,100,0,0,0), (19,0,1,1,102,3,0,0),
      |    (19,0,1,2,101,3,0,0), (19,0,2,0,83,1,1,1), (19,0,2,1,87,3,0,0), (19,0,2,2,85,3,0,0), (19,1,0,0,118,0,0,0), (19,1,0,1,120,5,0,0),
      |    (19,1,0,2,115,5,0,0), (19,1,1,0,108,1,0,0), (19,1,2,0,92,1,0,0), (19,2,0,0,117,1,1,0), (19,2,0,1,121,5,0,0), (19,2,0,2,119,5,0,0),
      |    (19,2,1,0,109,1,0,0), (19,2,2,0,95,1,0,0)
      |), facepick AS (
      |  SELECT zone_id, phi, lam,
      |         arg_max(f, cos(phi)*cos(flat)*cos(lam - flng) + sin(phi)*sin(flat)) AS face,
      |         max(cos(phi)*cos(flat)*cos(lam - flng) + sin(phi)*sin(flat)) AS dot
      |  FROM pt CROSS JOIN faces
      |  GROUP BY zone_id, phi, lam
      |), proj AS (
      |  -- gnomonic projection into the face plane, Class III rotation (res 9 odd),
      |  -- aperture-7 scaling by sqrt(7) per res step
      |  SELECT p.zone_id, p.face,
      |         CASE WHEN acos(greatest(-1.0, least(1.0, dot))) < 1e-15 THEN 0.0
      |              ELSE tan(acos(greatest(-1.0, least(1.0, dot)))) / 0.38196601125010500003
      |                   * sqrt(7)*sqrt(7)*sqrt(7)*sqrt(7)*sqrt(7)*sqrt(7)*sqrt(7)*sqrt(7)*sqrt(7)
      |                   * cos(theta) END AS hx,
      |         CASE WHEN acos(greatest(-1.0, least(1.0, dot))) < 1e-15 THEN 0.0
      |              ELSE tan(acos(greatest(-1.0, least(1.0, dot)))) / 0.38196601125010500003
      |                   * sqrt(7)*sqrt(7)*sqrt(7)*sqrt(7)*sqrt(7)*sqrt(7)*sqrt(7)*sqrt(7)*sqrt(7)
      |                   * sin(theta) END AS hy
      |  FROM (
      |    SELECT zone_id, face, dot,
      |           -- theta = posAngle(faz - posAngle(az)) - asin(sqrt(3/28))  [Class III]
      |           CASE WHEN m2 < 0 THEN m2 + 2*pi() ELSE m2 END AS theta
      |    FROM (
      |      SELECT zone_id, face, dot,
      |             fmod(faz - (CASE WHEN m1 < 0 THEN m1 + 2*pi() ELSE m1 END)
      |                  - asin(sqrt(3.0/28.0)) + 2*pi(), 2*pi()) AS m2
      |      FROM (
      |        SELECT fp.zone_id, fp.face, fp.dot, fc.faz,
      |               fmod(atan2(cos(phi)*sin(lam - fc.flng),
      |                          cos(fc.flat)*sin(phi)
      |                          - sin(fc.flat)*cos(phi)*cos(lam - fc.flng)), 2*pi()) AS m1
      |        FROM facepick fp JOIN faces fc ON fc.f = fp.face
      |      )
      |    )
      |  ) p
      |), rounded AS (
      |  -- exact nearest hex center over the 4 enclosing parallelogram corners
      |  SELECT zone_id, face,
      |         CAST(best // 2147483648 AS BIGINT) - 1073741824 AS bi2,
      |         fmod_j - 1073741824 AS bj2
      |  FROM (
      |    SELECT zone_id, face, best, CAST(best % 2147483648 AS BIGINT) AS fmod_j
      |    FROM (
      |      SELECT zone_id, face,
      |             arg_min((ci + 1073741824) * 2147483648 + (cj + 1073741824),
      |                     (ci - 0.5*cj - hx)*(ci - 0.5*cj - hx)
      |                     + (cj*sqrt(3.0)/2.0 - hy)*(cj*sqrt(3.0)/2.0 - hy)) AS best
      |      FROM (
      |        SELECT zone_id, face, hx, hy,
      |               CAST(floor(hx + (hy / (sqrt(3.0)/2.0)) * 0.5) AS BIGINT) + dx AS ci,
      |               CAST(floor(hy / (sqrt(3.0)/2.0)) AS BIGINT) + dy AS cj
      |        FROM proj CROSS JOIN (VALUES (0,0),(1,0),(0,1),(1,1)) corners(dx, dy)
      |      )
      |      GROUP BY zone_id, face
      |    )
      |  )
      |), s9 AS (
      |  SELECT zone_id, face, bi2 - m AS i, bj2 - m AS j, -m AS k
      |  FROM (SELECT *, least(bi2, bj2, 0) AS m FROM rounded)
      |),
      |d9a AS (
      |  SELECT zone_id, i AS li, j AS lj, k AS lk,
      |         CAST(floor((3.0*ai - aj)/7.0 + 0.5) AS BIGINT) AS ui0, CAST(floor((ai + 2.0*aj)/7.0 + 0.5) AS BIGINT) AS uj0
      |  FROM (SELECT zone_id, i, j, k,
      |               CAST(i - k AS DOUBLE) AS ai, CAST(j - k AS DOUBLE) AS aj
      |        FROM s9)
      |), d9b AS (
      |  SELECT zone_id, li, lj, lk,
      |         ui0 - m AS ui, uj0 - m AS uj, -m AS uk
      |  FROM (SELECT *, least(ui0, uj0, 0) AS m FROM d9a)
      |), d9c AS (
      |  SELECT zone_id, li, lj, lk, ui, uj, uk,
      |         3*ui + uj AS ci0, 3*uj + uk AS cj0, ui + 3*uk AS ck0
      |  FROM d9b
      |), s8 AS (
      |  SELECT zone_id, ui AS i, uj AS j, uk AS k,
      |         4*(li - ci0 - m2) + 2*(lj - cj0 - m2) + (lk - ck0 - m2) AS d9
      |  FROM (SELECT *, least(li - ci0, lj - cj0, lk - ck0) AS m2 FROM d9c)
      |),
      |d8a AS (
      |  SELECT zone_id, i AS li, j AS lj, k AS lk,
      |         CAST(floor((2.0*ai + aj)/7.0 + 0.5) AS BIGINT) AS ui0, CAST(floor((3.0*aj - ai)/7.0 + 0.5) AS BIGINT) AS uj0
      |  FROM (SELECT zone_id, i, j, k,
      |               CAST(i - k AS DOUBLE) AS ai, CAST(j - k AS DOUBLE) AS aj
      |        FROM s8)
      |), d8b AS (
      |  SELECT zone_id, li, lj, lk,
      |         ui0 - m AS ui, uj0 - m AS uj, -m AS uk
      |  FROM (SELECT *, least(ui0, uj0, 0) AS m FROM d8a)
      |), d8c AS (
      |  SELECT zone_id, li, lj, lk, ui, uj, uk,
      |         3*ui + uk AS ci0, ui + 3*uj AS cj0, uj + 3*uk AS ck0
      |  FROM d8b
      |), s7 AS (
      |  SELECT zone_id, ui AS i, uj AS j, uk AS k,
      |         4*(li - ci0 - m2) + 2*(lj - cj0 - m2) + (lk - ck0 - m2) AS d8
      |  FROM (SELECT *, least(li - ci0, lj - cj0, lk - ck0) AS m2 FROM d8c)
      |),
      |d7a AS (
      |  SELECT zone_id, i AS li, j AS lj, k AS lk,
      |         CAST(floor((3.0*ai - aj)/7.0 + 0.5) AS BIGINT) AS ui0, CAST(floor((ai + 2.0*aj)/7.0 + 0.5) AS BIGINT) AS uj0
      |  FROM (SELECT zone_id, i, j, k,
      |               CAST(i - k AS DOUBLE) AS ai, CAST(j - k AS DOUBLE) AS aj
      |        FROM s7)
      |), d7b AS (
      |  SELECT zone_id, li, lj, lk,
      |         ui0 - m AS ui, uj0 - m AS uj, -m AS uk
      |  FROM (SELECT *, least(ui0, uj0, 0) AS m FROM d7a)
      |), d7c AS (
      |  SELECT zone_id, li, lj, lk, ui, uj, uk,
      |         3*ui + uj AS ci0, 3*uj + uk AS cj0, ui + 3*uk AS ck0
      |  FROM d7b
      |), s6 AS (
      |  SELECT zone_id, ui AS i, uj AS j, uk AS k,
      |         4*(li - ci0 - m2) + 2*(lj - cj0 - m2) + (lk - ck0 - m2) AS d7
      |  FROM (SELECT *, least(li - ci0, lj - cj0, lk - ck0) AS m2 FROM d7c)
      |),
      |d6a AS (
      |  SELECT zone_id, i AS li, j AS lj, k AS lk,
      |         CAST(floor((2.0*ai + aj)/7.0 + 0.5) AS BIGINT) AS ui0, CAST(floor((3.0*aj - ai)/7.0 + 0.5) AS BIGINT) AS uj0
      |  FROM (SELECT zone_id, i, j, k,
      |               CAST(i - k AS DOUBLE) AS ai, CAST(j - k AS DOUBLE) AS aj
      |        FROM s6)
      |), d6b AS (
      |  SELECT zone_id, li, lj, lk,
      |         ui0 - m AS ui, uj0 - m AS uj, -m AS uk
      |  FROM (SELECT *, least(ui0, uj0, 0) AS m FROM d6a)
      |), d6c AS (
      |  SELECT zone_id, li, lj, lk, ui, uj, uk,
      |         3*ui + uk AS ci0, ui + 3*uj AS cj0, uj + 3*uk AS ck0
      |  FROM d6b
      |), s5 AS (
      |  SELECT zone_id, ui AS i, uj AS j, uk AS k,
      |         4*(li - ci0 - m2) + 2*(lj - cj0 - m2) + (lk - ck0 - m2) AS d6
      |  FROM (SELECT *, least(li - ci0, lj - cj0, lk - ck0) AS m2 FROM d6c)
      |),
      |d5a AS (
      |  SELECT zone_id, i AS li, j AS lj, k AS lk,
      |         CAST(floor((3.0*ai - aj)/7.0 + 0.5) AS BIGINT) AS ui0, CAST(floor((ai + 2.0*aj)/7.0 + 0.5) AS BIGINT) AS uj0
      |  FROM (SELECT zone_id, i, j, k,
      |               CAST(i - k AS DOUBLE) AS ai, CAST(j - k AS DOUBLE) AS aj
      |        FROM s5)
      |), d5b AS (
      |  SELECT zone_id, li, lj, lk,
      |         ui0 - m AS ui, uj0 - m AS uj, -m AS uk
      |  FROM (SELECT *, least(ui0, uj0, 0) AS m FROM d5a)
      |), d5c AS (
      |  SELECT zone_id, li, lj, lk, ui, uj, uk,
      |         3*ui + uj AS ci0, 3*uj + uk AS cj0, ui + 3*uk AS ck0
      |  FROM d5b
      |), s4 AS (
      |  SELECT zone_id, ui AS i, uj AS j, uk AS k,
      |         4*(li - ci0 - m2) + 2*(lj - cj0 - m2) + (lk - ck0 - m2) AS d5
      |  FROM (SELECT *, least(li - ci0, lj - cj0, lk - ck0) AS m2 FROM d5c)
      |),
      |d4a AS (
      |  SELECT zone_id, i AS li, j AS lj, k AS lk,
      |         CAST(floor((2.0*ai + aj)/7.0 + 0.5) AS BIGINT) AS ui0, CAST(floor((3.0*aj - ai)/7.0 + 0.5) AS BIGINT) AS uj0
      |  FROM (SELECT zone_id, i, j, k,
      |               CAST(i - k AS DOUBLE) AS ai, CAST(j - k AS DOUBLE) AS aj
      |        FROM s4)
      |), d4b AS (
      |  SELECT zone_id, li, lj, lk,
      |         ui0 - m AS ui, uj0 - m AS uj, -m AS uk
      |  FROM (SELECT *, least(ui0, uj0, 0) AS m FROM d4a)
      |), d4c AS (
      |  SELECT zone_id, li, lj, lk, ui, uj, uk,
      |         3*ui + uk AS ci0, ui + 3*uj AS cj0, uj + 3*uk AS ck0
      |  FROM d4b
      |), s3 AS (
      |  SELECT zone_id, ui AS i, uj AS j, uk AS k,
      |         4*(li - ci0 - m2) + 2*(lj - cj0 - m2) + (lk - ck0 - m2) AS d4
      |  FROM (SELECT *, least(li - ci0, lj - cj0, lk - ck0) AS m2 FROM d4c)
      |),
      |d3a AS (
      |  SELECT zone_id, i AS li, j AS lj, k AS lk,
      |         CAST(floor((3.0*ai - aj)/7.0 + 0.5) AS BIGINT) AS ui0, CAST(floor((ai + 2.0*aj)/7.0 + 0.5) AS BIGINT) AS uj0
      |  FROM (SELECT zone_id, i, j, k,
      |               CAST(i - k AS DOUBLE) AS ai, CAST(j - k AS DOUBLE) AS aj
      |        FROM s3)
      |), d3b AS (
      |  SELECT zone_id, li, lj, lk,
      |         ui0 - m AS ui, uj0 - m AS uj, -m AS uk
      |  FROM (SELECT *, least(ui0, uj0, 0) AS m FROM d3a)
      |), d3c AS (
      |  SELECT zone_id, li, lj, lk, ui, uj, uk,
      |         3*ui + uj AS ci0, 3*uj + uk AS cj0, ui + 3*uk AS ck0
      |  FROM d3b
      |), s2 AS (
      |  SELECT zone_id, ui AS i, uj AS j, uk AS k,
      |         4*(li - ci0 - m2) + 2*(lj - cj0 - m2) + (lk - ck0 - m2) AS d3
      |  FROM (SELECT *, least(li - ci0, lj - cj0, lk - ck0) AS m2 FROM d3c)
      |),
      |d2a AS (
      |  SELECT zone_id, i AS li, j AS lj, k AS lk,
      |         CAST(floor((2.0*ai + aj)/7.0 + 0.5) AS BIGINT) AS ui0, CAST(floor((3.0*aj - ai)/7.0 + 0.5) AS BIGINT) AS uj0
      |  FROM (SELECT zone_id, i, j, k,
      |               CAST(i - k AS DOUBLE) AS ai, CAST(j - k AS DOUBLE) AS aj
      |        FROM s2)
      |), d2b AS (
      |  SELECT zone_id, li, lj, lk,
      |         ui0 - m AS ui, uj0 - m AS uj, -m AS uk
      |  FROM (SELECT *, least(ui0, uj0, 0) AS m FROM d2a)
      |), d2c AS (
      |  SELECT zone_id, li, lj, lk, ui, uj, uk,
      |         3*ui + uk AS ci0, ui + 3*uj AS cj0, uj + 3*uk AS ck0
      |  FROM d2b
      |), s1 AS (
      |  SELECT zone_id, ui AS i, uj AS j, uk AS k,
      |         4*(li - ci0 - m2) + 2*(lj - cj0 - m2) + (lk - ck0 - m2) AS d2
      |  FROM (SELECT *, least(li - ci0, lj - cj0, lk - ck0) AS m2 FROM d2c)
      |),
      |d1a AS (
      |  SELECT zone_id, i AS li, j AS lj, k AS lk,
      |         CAST(floor((3.0*ai - aj)/7.0 + 0.5) AS BIGINT) AS ui0, CAST(floor((ai + 2.0*aj)/7.0 + 0.5) AS BIGINT) AS uj0
      |  FROM (SELECT zone_id, i, j, k,
      |               CAST(i - k AS DOUBLE) AS ai, CAST(j - k AS DOUBLE) AS aj
      |        FROM s1)
      |), d1b AS (
      |  SELECT zone_id, li, lj, lk,
      |         ui0 - m AS ui, uj0 - m AS uj, -m AS uk
      |  FROM (SELECT *, least(ui0, uj0, 0) AS m FROM d1a)
      |), d1c AS (
      |  SELECT zone_id, li, lj, lk, ui, uj, uk,
      |         3*ui + uj AS ci0, 3*uj + uk AS cj0, ui + 3*uk AS ck0
      |  FROM d1b
      |), s0 AS (
      |  SELECT zone_id, ui AS i, uj AS j, uk AS k,
      |         4*(li - ci0 - m2) + 2*(lj - cj0 - m2) + (lk - ck0 - m2) AS d1
      |  FROM (SELECT *, least(li - ci0, lj - cj0, lk - ck0) AS m2 FROM d1c)
      |),
      |asm AS (
      |  SELECT s.zone_id, s9.face, s.i, s.j, s.k,
      |         [t1.d1, t2.d2, t3.d3, t4.d4, t5.d5, t6.d6, t7.d7, t8.d8, t9.d9] AS digits
      |  FROM s0 s
      |  JOIN s9 USING (zone_id)
      |  JOIN (SELECT zone_id, d9 FROM s8) t9 USING (zone_id)
      |JOIN (SELECT zone_id, d8 FROM s7) t8 USING (zone_id)
      |JOIN (SELECT zone_id, d7 FROM s6) t7 USING (zone_id)
      |JOIN (SELECT zone_id, d6 FROM s5) t6 USING (zone_id)
      |JOIN (SELECT zone_id, d5 FROM s4) t5 USING (zone_id)
      |JOIN (SELECT zone_id, d4 FROM s3) t4 USING (zone_id)
      |JOIN (SELECT zone_id, d3 FROM s2) t3 USING (zone_id)
      |JOIN (SELECT zone_id, d2 FROM s1) t2 USING (zone_id)
      |JOIN (SELECT zone_id, d1 FROM s0) t1 USING (zone_id)
      |), looked AS (
      |  SELECT asm.zone_id, asm.digits, bc, brot AS rot,
      |         bpent = 1 AS pent, bcw = 1 AS cwoff
      |  FROM asm JOIN bctab ON bf = face AND bi = i AND bj = j AND bk = k
      |), p0 AS (
      |  -- pentagon leading-K escape: one cw or ccw 60-degree rotation when
      |  -- the raw leading digit is the deleted K axis
      |  SELECT zone_id, bc, rot, pent, digits,
      |         CASE WHEN pent AND coalesce(list_filter(digits, d -> d != 0)[1], 0) = 1
      |              THEN CASE WHEN cwoff THEN list_transform(digits, d -> CASE WHEN d = 0 THEN 0 ELSE (CASE ((CASE d WHEN 1 THEN 0 WHEN 5 THEN 1 WHEN 4 THEN 2 WHEN 6 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 END) + 5) % 6 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 2 WHEN 5 THEN 3 END) END) ELSE list_transform(digits, d -> CASE WHEN d = 0 THEN 0 ELSE (CASE ((CASE d WHEN 1 THEN 0 WHEN 5 THEN 1 WHEN 4 THEN 2 WHEN 6 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 END) + 1) % 6 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 2 WHEN 5 THEN 3 END) END) END
      |              ELSE digits END AS pd0
      |  FROM looked
      |), p1 AS (SELECT *, CASE WHEN pent AND rot >= 1 THEN CASE WHEN coalesce(list_filter(list_transform(pd0, d -> CASE WHEN d = 0 THEN 0 ELSE (CASE ((CASE d WHEN 1 THEN 0 WHEN 5 THEN 1 WHEN 4 THEN 2 WHEN 6 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 END) + 1) % 6 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 2 WHEN 5 THEN 3 END) END), d -> d != 0)[1], 0) = 1 THEN list_transform(list_transform(pd0, d -> CASE WHEN d = 0 THEN 0 ELSE (CASE ((CASE d WHEN 1 THEN 0 WHEN 5 THEN 1 WHEN 4 THEN 2 WHEN 6 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 END) + 1) % 6 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 2 WHEN 5 THEN 3 END) END), d -> CASE WHEN d = 0 THEN 0 ELSE (CASE ((CASE d WHEN 1 THEN 0 WHEN 5 THEN 1 WHEN 4 THEN 2 WHEN 6 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 END) + 1) % 6 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 2 WHEN 5 THEN 3 END) END) ELSE list_transform(pd0, d -> CASE WHEN d = 0 THEN 0 ELSE (CASE ((CASE d WHEN 1 THEN 0 WHEN 5 THEN 1 WHEN 4 THEN 2 WHEN 6 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 END) + 1) % 6 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 2 WHEN 5 THEN 3 END) END) END ELSE pd0 END AS pd1 FROM p0
      |), p2 AS (SELECT *, CASE WHEN pent AND rot >= 2 THEN CASE WHEN coalesce(list_filter(list_transform(pd1, d -> CASE WHEN d = 0 THEN 0 ELSE (CASE ((CASE d WHEN 1 THEN 0 WHEN 5 THEN 1 WHEN 4 THEN 2 WHEN 6 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 END) + 1) % 6 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 2 WHEN 5 THEN 3 END) END), d -> d != 0)[1], 0) = 1 THEN list_transform(list_transform(pd1, d -> CASE WHEN d = 0 THEN 0 ELSE (CASE ((CASE d WHEN 1 THEN 0 WHEN 5 THEN 1 WHEN 4 THEN 2 WHEN 6 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 END) + 1) % 6 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 2 WHEN 5 THEN 3 END) END), d -> CASE WHEN d = 0 THEN 0 ELSE (CASE ((CASE d WHEN 1 THEN 0 WHEN 5 THEN 1 WHEN 4 THEN 2 WHEN 6 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 END) + 1) % 6 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 2 WHEN 5 THEN 3 END) END) ELSE list_transform(pd1, d -> CASE WHEN d = 0 THEN 0 ELSE (CASE ((CASE d WHEN 1 THEN 0 WHEN 5 THEN 1 WHEN 4 THEN 2 WHEN 6 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 END) + 1) % 6 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 2 WHEN 5 THEN 3 END) END) END ELSE pd1 END AS pd2 FROM p1
      |), p3 AS (SELECT *, CASE WHEN pent AND rot >= 3 THEN CASE WHEN coalesce(list_filter(list_transform(pd2, d -> CASE WHEN d = 0 THEN 0 ELSE (CASE ((CASE d WHEN 1 THEN 0 WHEN 5 THEN 1 WHEN 4 THEN 2 WHEN 6 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 END) + 1) % 6 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 2 WHEN 5 THEN 3 END) END), d -> d != 0)[1], 0) = 1 THEN list_transform(list_transform(pd2, d -> CASE WHEN d = 0 THEN 0 ELSE (CASE ((CASE d WHEN 1 THEN 0 WHEN 5 THEN 1 WHEN 4 THEN 2 WHEN 6 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 END) + 1) % 6 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 2 WHEN 5 THEN 3 END) END), d -> CASE WHEN d = 0 THEN 0 ELSE (CASE ((CASE d WHEN 1 THEN 0 WHEN 5 THEN 1 WHEN 4 THEN 2 WHEN 6 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 END) + 1) % 6 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 2 WHEN 5 THEN 3 END) END) ELSE list_transform(pd2, d -> CASE WHEN d = 0 THEN 0 ELSE (CASE ((CASE d WHEN 1 THEN 0 WHEN 5 THEN 1 WHEN 4 THEN 2 WHEN 6 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 END) + 1) % 6 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 2 WHEN 5 THEN 3 END) END) END ELSE pd2 END AS pd3 FROM p2
      |), p4 AS (SELECT *, CASE WHEN pent AND rot >= 4 THEN CASE WHEN coalesce(list_filter(list_transform(pd3, d -> CASE WHEN d = 0 THEN 0 ELSE (CASE ((CASE d WHEN 1 THEN 0 WHEN 5 THEN 1 WHEN 4 THEN 2 WHEN 6 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 END) + 1) % 6 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 2 WHEN 5 THEN 3 END) END), d -> d != 0)[1], 0) = 1 THEN list_transform(list_transform(pd3, d -> CASE WHEN d = 0 THEN 0 ELSE (CASE ((CASE d WHEN 1 THEN 0 WHEN 5 THEN 1 WHEN 4 THEN 2 WHEN 6 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 END) + 1) % 6 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 2 WHEN 5 THEN 3 END) END), d -> CASE WHEN d = 0 THEN 0 ELSE (CASE ((CASE d WHEN 1 THEN 0 WHEN 5 THEN 1 WHEN 4 THEN 2 WHEN 6 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 END) + 1) % 6 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 2 WHEN 5 THEN 3 END) END) ELSE list_transform(pd3, d -> CASE WHEN d = 0 THEN 0 ELSE (CASE ((CASE d WHEN 1 THEN 0 WHEN 5 THEN 1 WHEN 4 THEN 2 WHEN 6 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 END) + 1) % 6 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 2 WHEN 5 THEN 3 END) END) END ELSE pd3 END AS pd4 FROM p3
      |), fin AS (
      |  SELECT zone_id,
      |         576460752303423488 + 9 * 4503599627370496
      |         + bc * 35184372088832
      |         + list_sum(list_transform(
      |             CASE WHEN pent THEN pd4 ELSE list_transform(digits, d -> CASE WHEN d = 0 THEN 0 ELSE (CASE ((CASE d WHEN 1 THEN 0 WHEN 5 THEN 1 WHEN 4 THEN 2 WHEN 6 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 END) + rot) % 6 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 2 WHEN 5 THEN 3 END) END) END,
      |             (d, idx) -> d * CAST(round(power(8.0, 15 - idx)) AS BIGINT)))
      |         + 262143 AS h
      |  FROM p4
      |)
      |SELECT zone_id, lower(hex(h)) AS h3_9 FROM fin ORDER BY zone_id""".stripMargin

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
    * exactly the per-zone fact population — which the oracle states
    * directly, with no H3 at all. */
  val multiresJoin: String =
    """SELECT n_nationkey AS zone_id, count(*) AS n_facts
      |FROM customer JOIN nation ON c_custkey % 25 = n_nationkey
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
