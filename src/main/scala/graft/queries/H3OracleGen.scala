package graft.queries

/** Generator for the independent DuckDB-SQL H3 forward (`latLngToCell`)
  * at ANY odd resolution, over an arbitrary keyed point relation —
  * round 12's generalization of the handwritten res-9 forward that has
  * gated `f6_hex_index`/`x_h3_roundtrip` since round 10 (same algorithm,
  * same published constants; see [[H3OracleSql]] for the full
  * provenance/authorship scaladoc). The SQL text is GENERATED, but the
  * algorithm is authored here stage by stage against the published H3
  * spec — nothing is produced from engine code paths, and the engine's
  * Scala implementation shares no code with this text.
  *
  * Parameterizing the forward is what makes probe-grid oracles possible:
  * the round-12 oracles for `x_h3_ring` / `x_h3_spatial_join` /
  * `x_h3_grid_distance` / `x_h3_polyfill` evaluate this forward over
  * tens of thousands of deterministic grid points and recover cell
  * ADJACENCY (boundary-crossing witness pairs between grid-neighbor
  * probes) and cell CENTERS (staged refinement through the digit-0
  * center-chain cells) with no H3 traversal or inverse code in SQL at
  * all — geometry in, 64-bit ids out, everything in between is DuckDB
  * re-deriving the published algorithm for itself.
  *
  * Only ODD resolutions are supported (every oracle res used is odd:
  * 3, 5, 7, 9, 11, 13, 15) — the initial hex-grid rotation is Class III
  * for odd res, which is what the projection stage implements; an
  * even-res caller gets an exception, not silently wrong SQL.
  */
object H3OracleGen {

  /** Published face-center geometry (H3 `faceijk.c`) — shared constant. */
  private val facesRows: String =
    """    (0, 0.80358264971899, 1.2483974196173961, 5.6199582685239395),
    (1, 1.3077478834556382, 2.5369450098779214, 5.7603390817141875),
    (2, 1.054751253523952, -1.3475173589003966, 0.78021365439343),
    (3, 0.6001915955381868, -0.45060390946975576, 0.4304693639799999),
    (4, 0.49171542819877384, 0.40198820291130694, 6.130269123335111),
    (5, 0.1727453274156187, 1.6781468852804338, 2.692877706530643),
    (6, 0.6059293215713507, 2.9539233298124117, 2.982963003477244),
    (7, 0.42737051832897965, -1.8888762003362853, 3.532912002790141),
    (8, -0.07906611854921283, -0.7334295133808677, 3.494305004259568),
    (9, -0.23096164445538364, 0.506495587332349, 3.0032141694995382),
    (10, 0.07906611854921283, 2.4081631402089254, 5.930472956509812),
    (11, 0.23096164445538364, -2.635097066257444, 0.13837848409025486),
    (12, -0.1727453274156187, -1.4634457683093596, 0.4487149470591504),
    (13, -0.6059293215713507, -0.18766932377738163, 0.15862965011254937),
    (14, -0.42737051832897965, 1.2527164532535078, 5.891865957979238),
    (15, -0.6001915955381868, 2.6909887441200375, 2.711123289609793),
    (16, -0.49171542819877384, -2.7396044506784865, 3.294508837434268),
    (17, -0.80358264971899, -1.8931952339723972, 3.80481969224544),
    (18, -1.3077478834556382, -0.6046476437118721, 3.6644388790551923),
    (19, -1.054751253523952, 1.7940752946893965, 2.361378999196363)"""

  /** Base-cell orientation table content (`faceIjkBaseCells`): dumped
    * once from graft's self-checked derivation (see [[H3OracleSql]]
    * provenance notes) and fixed as text. */
  private val bctabRows: String =
    """    (0,0,0,0,16,0,0,0), (0,0,0,1,18,0,0,0), (0,0,0,2,24,0,1,0), (0,0,1,0,33,0,0,0), (0,0,1,1,30,0,0,0), (0,0,1,2,32,3,0,0),
    (0,0,2,0,49,1,1,1), (0,0,2,1,48,3,0,0), (0,0,2,2,50,3,0,0), (0,1,0,0,8,0,0,0), (0,1,0,1,5,0,0,0), (0,1,0,2,10,5,0,0),
    (0,1,1,0,22,0,0,0), (0,1,2,0,41,1,0,0), (0,2,0,0,4,0,1,0), (0,2,0,1,0,5,0,0), (0,2,0,2,2,5,0,0), (0,2,1,0,15,1,0,0),
    (0,2,2,0,31,1,0,0), (1,0,0,0,2,0,0,0), (1,0,0,1,6,0,0,0), (1,0,0,2,14,0,1,0), (1,0,1,0,10,0,0,0), (1,0,1,1,11,0,0,0),
    (1,0,1,2,17,3,0,0), (1,0,2,0,24,1,1,1), (1,0,2,1,23,3,0,0), (1,0,2,2,25,3,0,0), (1,1,0,0,0,0,0,0), (1,1,0,1,1,0,0,0),
    (1,1,0,2,9,5,0,0), (1,1,1,0,5,1,0,0), (1,1,2,0,18,1,0,0), (1,2,0,0,4,1,1,0), (1,2,0,1,3,5,0,0), (1,2,0,2,7,5,0,0),
    (1,2,1,0,8,1,0,0), (1,2,2,0,16,1,0,0), (2,0,0,0,7,0,0,0), (2,0,0,1,21,0,0,0), (2,0,0,2,38,0,1,0), (2,0,1,0,9,0,0,0),
    (2,0,1,1,19,0,0,0), (2,0,1,2,34,3,0,0), (2,0,2,0,14,1,1,1), (2,0,2,1,20,3,0,0), (2,0,2,2,36,3,0,0), (2,1,0,0,3,0,0,0),
    (2,1,0,1,13,0,0,0), (2,1,0,2,29,5,0,0), (2,1,1,0,1,1,0,0), (2,1,2,0,6,1,0,0), (2,2,0,0,4,2,1,0), (2,2,0,1,12,5,0,0),
    (2,2,0,2,26,5,0,0), (2,2,1,0,0,1,0,0), (2,2,2,0,2,1,0,0), (3,0,0,0,26,0,0,0), (3,0,0,1,42,0,0,0), (3,0,0,2,58,0,1,0),
    (3,0,1,0,29,0,0,0), (3,0,1,1,43,0,0,0), (3,0,1,2,62,3,0,0), (3,0,2,0,38,1,1,1), (3,0,2,1,47,3,0,0), (3,0,2,2,64,3,0,0),
    (3,1,0,0,12,0,0,0), (3,1,0,1,28,0,0,0), (3,1,0,2,44,5,0,0), (3,1,1,0,13,1,0,0), (3,1,2,0,21,1,0,0), (3,2,0,0,4,3,1,0),
    (3,2,0,1,15,5,0,0), (3,2,0,2,31,5,0,0), (3,2,1,0,3,1,0,0), (3,2,2,0,7,1,0,0), (4,0,0,0,31,0,0,0), (4,0,0,1,41,0,0,0),
    (4,0,0,2,49,0,1,0), (4,0,1,0,44,0,0,0), (4,0,1,1,53,0,0,0), (4,0,1,2,61,3,0,0), (4,0,2,0,58,1,1,1), (4,0,2,1,65,3,0,0),
    (4,0,2,2,75,3,0,0), (4,1,0,0,15,0,0,0), (4,1,0,1,22,5,0,0), (4,1,0,2,33,5,0,0), (4,1,1,0,28,1,0,0), (4,1,2,0,42,1,0,0),
    (4,2,0,0,4,4,1,0), (4,2,0,1,8,5,0,0), (4,2,0,2,16,5,0,0), (4,2,1,0,12,1,0,0), (4,2,2,0,26,1,0,0), (5,0,0,0,50,0,0,0),
    (5,0,0,1,48,0,0,0), (5,0,0,2,49,3,1,0), (5,0,1,0,32,0,0,0), (5,0,1,1,30,3,0,0), (5,0,1,2,33,3,0,0), (5,0,2,0,24,3,1,1),
    (5,0,2,1,18,3,0,0), (5,0,2,2,16,3,0,0), (5,1,0,0,70,0,0,0), (5,1,0,1,67,0,0,0), (5,1,0,2,66,3,0,0), (5,1,1,0,52,0,0,0),
    (5,1,2,0,37,3,0,0), (5,2,0,0,83,0,1,0), (5,2,0,1,87,3,0,0), (5,2,0,2,85,3,0,0), (5,2,1,0,74,3,0,0), (5,2,2,0,57,3,0,0),
    (6,0,0,0,25,0,0,0), (6,0,0,1,23,0,0,0), (6,0,0,2,24,3,1,0), (6,0,1,0,17,0,0,0), (6,0,1,1,11,3,0,0), (6,0,1,2,10,3,0,0),
    (6,0,2,0,14,3,1,1), (6,0,2,1,6,3,0,0), (6,0,2,2,2,3,0,0), (6,1,0,0,45,0,0,0), (6,1,0,1,39,0,0,0), (6,1,0,2,37,3,0,0),
    (6,1,1,0,35,0,0,0), (6,1,2,0,27,3,0,0), (6,2,0,0,63,0,1,0), (6,2,0,1,59,3,0,0), (6,2,0,2,57,3,0,0), (6,2,1,0,56,3,0,0),
    (6,2,2,0,46,3,0,0), (7,0,0,0,36,0,0,0), (7,0,0,1,20,0,0,0), (7,0,0,2,14,3,1,0), (7,0,1,0,34,0,0,0), (7,0,1,1,19,3,0,0),
    (7,0,1,2,9,3,0,0), (7,0,2,0,38,3,1,1), (7,0,2,1,21,3,0,0), (7,0,2,2,7,3,0,0), (7,1,0,0,55,0,0,0), (7,1,0,1,40,0,0,0),
    (7,1,0,2,27,3,0,0), (7,1,1,0,54,0,0,0), (7,1,2,0,51,3,0,0), (7,2,0,0,72,0,1,0), (7,2,0,1,60,3,0,0), (7,2,0,2,46,3,0,0),
    (7,2,1,0,73,3,0,0), (7,2,2,0,71,3,0,0), (8,0,0,0,64,0,0,0), (8,0,0,1,47,0,0,0), (8,0,0,2,38,3,1,0), (8,0,1,0,62,0,0,0),
    (8,0,1,1,43,3,0,0), (8,0,1,2,29,3,0,0), (8,0,2,0,58,3,1,1), (8,0,2,1,42,3,0,0), (8,0,2,2,26,3,0,0), (8,1,0,0,84,0,0,0),
    (8,1,0,1,69,0,0,0), (8,1,0,2,51,3,0,0), (8,1,1,0,82,0,0,0), (8,1,2,0,76,3,0,0), (8,2,0,0,97,0,1,0), (8,2,0,1,89,3,0,0),
    (8,2,0,2,71,3,0,0), (8,2,1,0,98,3,0,0), (8,2,2,0,96,3,0,0), (9,0,0,0,75,0,0,0), (9,0,0,1,65,0,0,0), (9,0,0,2,58,3,1,0),
    (9,0,1,0,61,0,0,0), (9,0,1,1,53,3,0,0), (9,0,1,2,44,3,0,0), (9,0,2,0,49,3,1,1), (9,0,2,1,41,3,0,0), (9,0,2,2,31,3,0,0),
    (9,1,0,0,94,0,0,0), (9,1,0,1,86,0,0,0), (9,1,0,2,76,3,0,0), (9,1,1,0,81,0,0,0), (9,1,2,0,66,3,0,0), (9,2,0,0,107,0,1,0),
    (9,2,0,1,104,3,0,0), (9,2,0,2,96,3,0,0), (9,2,1,0,101,3,0,0), (9,2,2,0,85,3,0,0), (10,0,0,0,57,0,0,0), (10,0,0,1,59,0,0,0),
    (10,0,0,2,63,3,1,0), (10,0,1,0,74,0,0,0), (10,0,1,1,78,0,0,0), (10,0,1,2,79,3,0,0), (10,0,2,0,83,3,1,1), (10,0,2,1,92,3,0,0),
    (10,0,2,2,95,3,0,0), (10,1,0,0,37,0,0,0), (10,1,0,1,39,3,0,0), (10,1,0,2,45,3,0,0), (10,1,1,0,52,3,0,0), (10,1,2,0,70,3,0,0),
    (10,2,0,0,24,0,1,0), (10,2,0,1,23,3,0,0), (10,2,0,2,25,3,0,0), (10,2,1,0,32,3,0,0), (10,2,2,0,50,3,0,0), (11,0,0,0,46,0,0,0),
    (11,0,0,1,60,0,0,0), (11,0,0,2,72,3,1,0), (11,0,1,0,56,0,0,0), (11,0,1,1,68,0,0,0), (11,0,1,2,80,3,0,0), (11,0,2,0,63,3,1,1),
    (11,0,2,1,77,3,0,0), (11,0,2,2,90,3,0,0), (11,1,0,0,27,0,0,0), (11,1,0,1,40,3,0,0), (11,1,0,2,55,3,0,0), (11,1,1,0,35,3,0,0),
    (11,1,2,0,45,3,0,0), (11,2,0,0,14,0,1,0), (11,2,0,1,20,3,0,0), (11,2,0,2,36,3,0,0), (11,2,1,0,17,3,0,0), (11,2,2,0,25,3,0,0),
    (12,0,0,0,71,0,0,0), (12,0,0,1,89,0,0,0), (12,0,0,2,97,3,1,0), (12,0,1,0,73,0,0,0), (12,0,1,1,91,0,0,0), (12,0,1,2,103,3,0,0),
    (12,0,2,0,72,3,1,1), (12,0,2,1,88,3,0,0), (12,0,2,2,105,3,0,0), (12,1,0,0,51,0,0,0), (12,1,0,1,69,3,0,0), (12,1,0,2,84,3,0,0),
    (12,1,1,0,54,3,0,0), (12,1,2,0,55,3,0,0), (12,2,0,0,38,0,1,0), (12,2,0,1,47,3,0,0), (12,2,0,2,64,3,0,0), (12,2,1,0,34,3,0,0),
    (12,2,2,0,36,3,0,0), (13,0,0,0,96,0,0,0), (13,0,0,1,104,0,0,0), (13,0,0,2,107,3,1,0), (13,0,1,0,98,0,0,0), (13,0,1,1,110,0,0,0),
    (13,0,1,2,115,3,0,0), (13,0,2,0,97,3,1,1), (13,0,2,1,111,3,0,0), (13,0,2,2,119,3,0,0), (13,1,0,0,76,0,0,0), (13,1,0,1,86,3,0,0),
    (13,1,0,2,94,3,0,0), (13,1,1,0,82,3,0,0), (13,1,2,0,84,3,0,0), (13,2,0,0,58,0,1,0), (13,2,0,1,65,3,0,0), (13,2,0,2,75,3,0,0),
    (13,2,1,0,62,3,0,0), (13,2,2,0,64,3,0,0), (14,0,0,0,85,0,0,0), (14,0,0,1,87,0,0,0), (14,0,0,2,83,3,1,0), (14,0,1,0,101,0,0,0),
    (14,0,1,1,102,0,0,0), (14,0,1,2,100,3,0,0), (14,0,2,0,107,3,1,1), (14,0,2,1,112,3,0,0), (14,0,2,2,114,3,0,0), (14,1,0,0,66,0,0,0),
    (14,1,0,1,67,3,0,0), (14,1,0,2,70,3,0,0), (14,1,1,0,81,3,0,0), (14,1,2,0,94,3,0,0), (14,2,0,0,49,0,1,0), (14,2,0,1,48,3,0,0),
    (14,2,0,2,50,3,0,0), (14,2,1,0,61,3,0,0), (14,2,2,0,75,3,0,0), (15,0,0,0,95,0,0,0), (15,0,0,1,92,0,0,0), (15,0,0,2,83,0,1,0),
    (15,0,1,0,79,0,0,0), (15,0,1,1,78,3,0,0), (15,0,1,2,74,3,0,0), (15,0,2,0,63,1,1,1), (15,0,2,1,59,3,0,0), (15,0,2,2,57,3,0,0),
    (15,1,0,0,109,0,0,0), (15,1,0,1,108,0,0,0), (15,1,0,2,100,5,0,0), (15,1,1,0,93,0,0,0), (15,1,2,0,77,1,0,0), (15,2,0,0,117,0,1,0),
    (15,2,0,1,118,5,0,0), (15,2,0,2,114,5,0,0), (15,2,1,0,106,1,0,0), (15,2,2,0,90,1,0,0), (16,0,0,0,90,0,0,0), (16,0,0,1,77,0,0,0),
    (16,0,0,2,63,0,1,0), (16,0,1,0,80,0,0,0), (16,0,1,1,68,3,0,0), (16,0,1,2,56,3,0,0), (16,0,2,0,72,1,1,1), (16,0,2,1,60,3,0,0),
    (16,0,2,2,46,3,0,0), (16,1,0,0,106,0,0,0), (16,1,0,1,93,5,0,0), (16,1,0,2,79,5,0,0), (16,1,1,0,99,0,0,0), (16,1,2,0,88,1,0,0),
    (16,2,0,0,117,4,1,0), (16,2,0,1,109,5,0,0), (16,2,0,2,95,5,0,0), (16,2,1,0,113,1,0,0), (16,2,2,0,105,1,0,0), (17,0,0,0,105,0,0,0),
    (17,0,0,1,88,0,0,0), (17,0,0,2,72,0,1,0), (17,0,1,0,103,0,0,0), (17,0,1,1,91,3,0,0), (17,0,1,2,73,3,0,0), (17,0,2,0,97,1,1,1),
    (17,0,2,1,89,3,0,0), (17,0,2,2,71,3,0,0), (17,1,0,0,113,0,0,0), (17,1,0,1,99,5,0,0), (17,1,0,2,80,5,0,0), (17,1,1,0,116,0,0,0),
    (17,1,2,0,111,1,0,0), (17,2,0,0,117,3,1,0), (17,2,0,1,106,5,0,0), (17,2,0,2,90,5,0,0), (17,2,1,0,121,1,0,0), (17,2,2,0,119,1,0,0),
    (18,0,0,0,119,0,0,0), (18,0,0,1,111,0,0,0), (18,0,0,2,97,0,1,0), (18,0,1,0,115,0,0,0), (18,0,1,1,110,3,0,0), (18,0,1,2,98,3,0,0),
    (18,0,2,0,107,1,1,1), (18,0,2,1,104,3,0,0), (18,0,2,2,96,3,0,0), (18,1,0,0,121,0,0,0), (18,1,0,1,116,5,0,0), (18,1,0,2,103,5,0,0),
    (18,1,1,0,120,0,0,0), (18,1,2,0,112,1,0,0), (18,2,0,0,117,2,1,0), (18,2,0,1,113,5,0,0), (18,2,0,2,105,5,0,0), (18,2,1,0,118,1,0,0),
    (18,2,2,0,114,1,0,0), (19,0,0,0,114,0,0,0), (19,0,0,1,112,0,0,0), (19,0,0,2,107,0,1,0), (19,0,1,0,100,0,0,0), (19,0,1,1,102,3,0,0),
    (19,0,1,2,101,3,0,0), (19,0,2,0,83,1,1,1), (19,0,2,1,87,3,0,0), (19,0,2,2,85,3,0,0), (19,1,0,0,118,0,0,0), (19,1,0,1,120,5,0,0),
    (19,1,0,2,115,5,0,0), (19,1,1,0,108,1,0,0), (19,1,2,0,92,1,0,0), (19,2,0,0,117,1,1,0), (19,2,0,1,121,5,0,0), (19,2,0,2,119,5,0,0),
    (19,2,1,0,109,1,0,0), (19,2,2,0,95,1,0,0)"""

  /** The two shared VALUES CTEs. Emit exactly once per query, at the
    * head of the WITH list, before any [[forward]] block. */
  val constCtes: String =
    s"""faces(f, flat, flng, faz) AS (VALUES
       |$facesRows),
       |bctab(bf, bi, bj, bk, bc, brot, bpent, bcw) AS (VALUES
       |$bctabRows)""".stripMargin

  /** One 60-degree rotation of an aperture-7 digit by `steps` (both SQL
    * snippets): digit -> CCW direction ordinal -> +steps mod 6 ->
    * digit; the center digit 0 is fixed. */
  private def rot60(d: String, steps: String): String =
    s"CASE WHEN $d = 0 THEN 0 ELSE (CASE ((CASE $d WHEN 1 THEN 0 WHEN 5 THEN 1" +
      s" WHEN 4 THEN 2 WHEN 6 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 END) + $steps) % 6" +
      " WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 2" +
      " WHEN 5 THEN 3 END) END"

  private def rotList(l: String, steps: String): String =
    s"list_transform($l, d -> ${rot60("d", steps)})"

  private def firstNz(l: String): String =
    s"coalesce(list_filter($l, d -> d != 0)[1], 0)"

  /** CTE blocks computing the H3 forward at odd `res` for every row of
    * CTE `src` (columns: `keys...`, `phi`, `lam` — radians), producing
    * CTE `out`(`keys...`, `h` BIGINT). Intermediate CTE names are
    * suffixed `_<out>` so multiple forwards compose in one query.
    * Returns text to splice into the WITH list (leading comma included).
    */
  /** Column names the generated stages use internally — a key column
    * shadowing one would silently corrupt joins (found the hard way:
    * a key named `k` captured the bctab lookup's ijk coordinate and
    * dropped 147 of 150 rows). */
  private val ReservedCols: Set[String] =
    Set("phi", "lam", "face", "dot", "theta", "m1", "m2", "hx", "hy",
      "ci", "cj", "dx", "dy", "best", "bi2", "bj2", "m", "i", "j", "k",
      "li", "lj", "lk", "ai", "aj", "ui", "uj", "uk", "ui0", "uj0",
      "ci0", "cj0", "ck0", "digits", "bc", "rot", "pent", "cwoff", "h",
      "f", "flat", "flng", "faz", "bf", "bi", "bj", "bk", "brot",
      "bpent", "bcw") ++ (0 to 15).map(d => s"d$d") ++
      (0 to 4).map(t => s"pd$t")

  def forward(src: String, res: Int, keys: Seq[String], out: String): String = {
    require(res % 2 == 1 && res >= 1 && res <= 15,
      s"forward oracle supports odd res 1..15, got $res")
    val clash = keys.map(_.toLowerCase).toSet.intersect(ReservedCols)
    require(clash.isEmpty,
      s"forward key column(s) $clash shadow generated stage columns")
    val ks = keys.mkString(", ")
    val fpks = keys.map("fp." + _).mkString(", ")
    val sqrt7s = Seq.fill(res)("sqrt(7)").mkString("*")
    val sb = new StringBuilder

    // nearest-face argmax
    sb ++= s""",
fp_$out AS (
  SELECT $ks, phi, lam,
         arg_max(f, cos(phi)*cos(flat)*cos(lam - flng) + sin(phi)*sin(flat)) AS face,
         max(cos(phi)*cos(flat)*cos(lam - flng) + sin(phi)*sin(flat)) AS dot
  FROM $src CROSS JOIN faces
  GROUP BY $ks, phi, lam
),"""

    // gnomonic projection into the face plane, Class III rotation (odd
    // res), aperture-7 scaling by sqrt(7) per res step
    sb ++= s"""
pj_$out AS (
  SELECT $ks, face,
         CASE WHEN acos(greatest(-1.0, least(1.0, dot))) < 1e-15 THEN 0.0
              ELSE tan(acos(greatest(-1.0, least(1.0, dot)))) / 0.38196601125010500003
                   * $sqrt7s
                   * cos(theta) END AS hx,
         CASE WHEN acos(greatest(-1.0, least(1.0, dot))) < 1e-15 THEN 0.0
              ELSE tan(acos(greatest(-1.0, least(1.0, dot)))) / 0.38196601125010500003
                   * $sqrt7s
                   * sin(theta) END AS hy
  FROM (
    SELECT $ks, face, dot,
           CASE WHEN m2 < 0 THEN m2 + 2*pi() ELSE m2 END AS theta
    FROM (
      SELECT $ks, face, dot,
             fmod(faz - (CASE WHEN m1 < 0 THEN m1 + 2*pi() ELSE m1 END)
                  - asin(sqrt(3.0/28.0)) + 2*pi(), 2*pi()) AS m2
      FROM (
        SELECT $fpks, fp.face, fp.dot, fc.faz,
               fmod(atan2(cos(phi)*sin(lam - fc.flng),
                          cos(fc.flat)*sin(phi)
                          - sin(fc.flat)*cos(phi)*cos(lam - fc.flng)), 2*pi()) AS m1
        FROM fp_$out fp JOIN faces fc ON fc.f = fp.face
      )
    )
  )
),"""

    // exact nearest hex center over the 4 enclosing parallelogram
    // corners, then normalize to cube ijk
    sb ++= s"""
rd_$out AS (
  SELECT $ks, face, bi2 - m AS i, bj2 - m AS j, -m AS k
  FROM (
    SELECT *, least(bi2, bj2, 0) AS m
    FROM (
      SELECT $ks, face,
             CAST(best // 2147483648 AS BIGINT) - 1073741824 AS bi2,
             CAST(best % 2147483648 AS BIGINT) - 1073741824 AS bj2
      FROM (
        SELECT $ks, face,
               arg_min((ci + 1073741824) * 2147483648 + (cj + 1073741824),
                       (ci - 0.5*cj - hx)*(ci - 0.5*cj - hx)
                       + (cj*sqrt(3.0)/2.0 - hy)*(cj*sqrt(3.0)/2.0 - hy)) AS best
        FROM (
          SELECT $ks, face, hx, hy,
                 CAST(floor(hx + (hy / (sqrt(3.0)/2.0)) * 0.5) AS BIGINT) + dx AS ci,
                 CAST(floor(hy / (sqrt(3.0)/2.0)) AS BIGINT) + dy AS cj
          FROM pj_$out CROSS JOIN (VALUES (0,0),(1,0),(0,1),(1,1)) corners(dx, dy)
        )
        GROUP BY $ks, face
      )
    )
  )
)"""

    // digit-extraction stages, res down to 1; digits accumulate as
    // carried columns (no end-of-pipeline self-join)
    for (r <- res to 1 by -1) {
      val tin = if (r == res) s"rd_$out" else s"st${r + 1}_$out"
      val carried = (res to (r + 1) by -1).map(d => s"d$d")
      val carry = if (carried.isEmpty) "" else carried.mkString(", ", ", ", "")
      val (uiNum, ujNum, ci0, cj0, ck0) =
        if (r % 2 == 1)
          ("3.0*ai - aj", "ai + 2.0*aj", "3*ui + uj", "3*uj + uk", "ui + 3*uk")
        else
          ("2.0*ai + aj", "3.0*aj - ai", "3*ui + uk", "ui + 3*uj", "uj + 3*uk")
      sb ++= s""",
st${r}_$out AS (
  SELECT $ks, face$carry, ui AS i, uj AS j, uk AS k,
         4*(li - ci0 - m2) + 2*(lj - cj0 - m2) + (lk - ck0 - m2) AS d$r
  FROM (
    SELECT *, least(li - ci0, lj - cj0, lk - ck0) AS m2
    FROM (
      SELECT *, $ci0 AS ci0, $cj0 AS cj0, $ck0 AS ck0
      FROM (
        SELECT *, ui0 - m AS ui, uj0 - m AS uj, -m AS uk
        FROM (
          SELECT *, least(ui0, uj0, 0) AS m
          FROM (
            SELECT $ks, face$carry, i AS li, j AS lj, k AS lk,
                   CAST(floor(($uiNum)/7.0 + 0.5) AS BIGINT) AS ui0,
                   CAST(floor(($ujNum)/7.0 + 0.5) AS BIGINT) AS uj0
            FROM (SELECT *, CAST(i - k AS DOUBLE) AS ai,
                         CAST(j - k AS DOUBLE) AS aj FROM $tin)
          )
        )
      )
    )
  )
)"""
    }

    // base-cell lookup on the res-0 ijk, then the pentagon finishing
    // path: leading-K escape (one cw/ccw rotation) + up to `rot`
    // K-skipping pentagon rotations; hexagons rotate all digits by rot
    val digitsList = (1 to res).map(d => s"d$d").mkString("[", ", ", "]")
    sb ++= s""",
lk_$out AS (
  SELECT $ks, $digitsList AS digits, bc, brot AS rot,
         bpent = 1 AS pent, bcw = 1 AS cwoff
  FROM st1_$out JOIN bctab ON bf = face AND bi = i AND bj = j AND bk = k
),
pf0_$out AS (
  SELECT $ks, bc, rot, pent, digits,
         CASE WHEN pent AND ${firstNz("digits")} = 1
              THEN CASE WHEN cwoff THEN ${rotList("digits", "5")}
                        ELSE ${rotList("digits", "1")} END
              ELSE digits END AS pd0
  FROM lk_$out
)"""
    for (t <- 1 to 4) {
      val prev = s"pd${t - 1}"
      val once = rotList(prev, "1")
      sb ++= s""",
pf${t}_$out AS (
  SELECT *,
         CASE WHEN pent AND rot >= $t
              THEN CASE WHEN ${firstNz(once)} = 1
                        THEN ${rotList(once, "1")}
                        ELSE $once END
              ELSE $prev END AS pd$t
  FROM pf${t - 1}_$out
)"""
    }
    // MATERIALIZED: DuckDB inlines CTEs by default, so a forward output
    // referenced N times would re-run the whole projection/digit
    // pipeline N times (the first polyfill-oracle draft timed out
    // exactly this way — 4 chained stages re-expanded exponentially)
    val trailing = (1L << (3 * (15 - res))) - 1
    sb ++= s""",
$out AS MATERIALIZED (
  SELECT $ks,
         576460752303423488 + $res * 4503599627370496
         + bc * 35184372088832
         + list_sum(list_transform(
             CASE WHEN pent THEN pd4 ELSE ${rotList("digits", "rot")} END,
             (d, idx) -> d * CAST(round(power(8.0, 15 - idx)) AS BIGINT)))
         + $trailing AS h
  FROM pf4_$out
)"""
    sb.toString
  }
}
