package graft.functions

import java.lang.Math._

/** Uber H3 cell indexing — `latLngToCell` (geo → res-r cell id), the
  * reference's `` `carto-os`.carto.H3_FROMGEOGPOINT(point, res) `` slot
  * (reference `taxi_trips_etl_packages/queries/enrichment_query.py:10,17`),
  * implemented from the PUBLISHED H3 algorithm and geometry (Uber H3 core
  * library docs + paper "H3: A Hexagonal Hierarchical Geospatial Indexing
  * System"): icosahedral gnomonic projection, aperture-7 hex grid with
  * alternating Class II/III orientation, 122 base cells (110 hexagons +
  * 12 pentagons at the icosahedron vertices), 64-bit index layout
  * (mode 1, 4-bit resolution, 7-bit base cell, 15 × 3-bit digits).
  *
  * What is taken from the published source verbatim: the 20 face-center
  * coordinates and face i-axis azimuths (`faceijk.c` constants — pure
  * geometry of H3's fixed icosahedron orientation) and the algorithm
  * structure. What is DERIVED here rather than copied: the base-cell
  * tables (`baseCellData` / `faceIjkBaseCells` in the C library) are
  * reconstructed at class-init from the face geometry itself —
  * enumerate every res-0 cell appearance on every face, cluster
  * appearances of the same cell, number cells by DESCENDING LATITUDE of
  * their centers (H3's published base-cell numbering), and recover each
  * appearance's 60°-rotation offset from the measured bearing mismatch
  * between face grids. The derivation self-checks: exactly 122 cells,
  * exactly 12 pentagons, pentagons at the published base-cell numbers
  * {4,14,24,38,49,58,63,72,83,97,107,117}, rotation residuals ≲ 1e-9.
  * End-to-end fidelity is asserted in `H3Spec` against published test
  * vectors (e.g. geo→cell of the H3 README's own examples).
  *
  * Pentagon caveat: the five faces around each pentagon meet at 72°, not
  * 60°, so a pentagon appearance's digit rotation is not geometric
  * quantization; it is recovered by a consistency search (every
  * straddling point pair across a face boundary must index identically,
  * and no pentagon index may carry a leading K digit). This pins a
  * self-consistent tiling; `H3Spec` documents which pentagon vectors are
  * externally validated. No taxi/test fixture touches a pentagon (all 12
  * sit in ocean).
  *
  * Scale: pure per-row arithmetic (trig + integer digit loop, no
  * allocation on the hot path beyond one 3-long array), exposed to Spark
  * as a codegen expression in [[graft.plans.H3CellExpr]] — stays inside
  * whole-stage codegen like the other hot-path functions.
  */
object H3 {

  // ------------------------------------------------------------------
  // Published face geometry (H3 faceijk.c): per-face center (lat,lng in
  // radians) and azimuth from the face center to its Class II i-axis
  // (which points at an icosahedron vertex). The other two axes sit at
  // exactly -2π/3 and -4π/3 from the first — asserted below.
  // ------------------------------------------------------------------
  private val FaceLat: Array[Double] = Array(
    0.803582649718989942, 1.307747883455638156, 1.054751253523952054,
    0.600191595538186799, 0.491715428198773866, 0.172745327415618701,
    0.605929321571350690, 0.427370518328979641, -0.079066118549212831,
    -0.230961644455383637, 0.079066118549212831, 0.230961644455383637,
    -0.172745327415618701, -0.605929321571350690, -0.427370518328979641,
    -0.600191595538186799, -0.491715428198773866, -0.803582649718989942,
    -1.307747883455638156, -1.054751253523952054)

  private val FaceLng: Array[Double] = Array(
    1.248397419617396099, 2.536945009877921159, -1.347517358900396623,
    -0.450603909469755746, 0.401988202911306943, 1.678146885280433686,
    2.953923329812411617, -1.888876200336285401, -0.733429513380867741,
    0.506495587332349035, 2.408163140208925497, -2.635097066257444203,
    -1.463445768309359553, -0.187669323777381622, 1.252716453253507838,
    2.690988744120037492, -2.739604450678486295, -1.893195233972397139,
    -0.604647643711872080, 1.794075294689396615)

  private val FaceAz0: Array[Double] = Array(
    5.619958268523939882, 5.760339081714187279, 0.780213654393430055,
    0.430469363979999913, 6.130269123335111400, 2.692877706530642877,
    2.982963003477243874, 3.532912002790141181, 3.494305004259568154,
    3.003214169499538391, 5.930472956509811562, 0.138378484090254847,
    0.448714947059150361, 0.158629650112549365, 5.891865957979238535,
    2.711123289609793325, 3.294508837434268316, 3.804819692245439833,
    3.664438879055192436, 2.361378999196363184)

  /** res-0 unit length (adjacent cell-center spacing) in gnomonic-plane
    * units = tan(center→vertex angle)/2 = (3-√5)/2. */
  private val Res0UGnomonic = 0.38196601125010500003
  /** Class III rotation: asin(√(3/28)). */
  private val Ap7Rot = asin(sqrt(3.0 / 28.0))
  private val Sqrt7 = sqrt(7.0)
  private val Sin60 = sqrt(3.0) / 2.0
  private val TwoPi = 2.0 * PI

  val MaxRes = 15
  val NumBaseCells = 122

  /** Published pentagon base-cell numbers — used as a derivation
    * self-check (the numbering rule must reproduce them exactly). */
  private val PentagonCells: Set[Int] =
    Set(4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)

  // ------------------------------------------------------------------
  // Spherical helpers
  // ------------------------------------------------------------------
  @inline private def posAngle(a: Double): Double = {
    val t = a % TwoPi
    if (t < 0.0) t + TwoPi else t
  }

  /** Bearing (azimuth) from (lat1,lng1) to (lat2,lng2), radians. */
  private def geoAzimuth(lat1: Double, lng1: Double,
      lat2: Double, lng2: Double): Double =
    atan2(cos(lat2) * sin(lng2 - lng1),
      cos(lat1) * sin(lat2) - sin(lat1) * cos(lat2) * cos(lng2 - lng1))

  /** Point at `az` bearing and angular distance `d` from (lat,lng). */
  private def geoAzDistance(lat: Double, lng: Double, az: Double,
      d: Double): (Double, Double) = {
    val sinLat2 = sin(lat) * cos(d) + cos(lat) * sin(d) * cos(az)
    val lat2 = asin(max(-1.0, min(1.0, sinLat2)))
    val lng2 = lng + atan2(sin(az) * sin(d) * cos(lat),
      cos(d) - sin(lat) * sinLat2)
    (lat2, lng2)
  }

  // ------------------------------------------------------------------
  // IJK coordinate algebra (CoordIJK): redundant 3-axis hex coords,
  // normalized = all components ≥ 0 with at least one 0. Digits:
  // CENTER=0 K=1 J=2 JK=3 I=4 IK=5 IJ=6 (digit = 4i+2j+k on unit ijk).
  // ------------------------------------------------------------------
  @inline private def normI(i: Long, j: Long, k: Long): (Long, Long, Long) = {
    val m = min(i, min(j, k))
    (i - m, j - m, k - m)
  }

  @inline private def ijkToHex2d(i: Long, j: Long, k: Long): (Double, Double) = {
    val ii = (i - k).toDouble
    val jj = (j - k).toDouble
    (ii - 0.5 * jj, jj * Sin60)
  }

  /** Nearest hex center in IJK coords. NOTE: H3's IJK axial frame has
    * its SHORT diagonal at (+1,+1) (the IJ direction — i and j axes meet
    * at 120°), so textbook cube-rounding (whose short diagonal is
    * (1,-1)) mis-rounds near the diagonal. Exact nearest-center over the
    * 4 corners of the enclosing basis parallelogram instead: the lattice
    * Delaunay triangulation is equilateral with both triangles of each
    * parallelogram spanned by its corners, and the max distance from a
    * triangle-interior point to its nearest vertex (circumradius 0.577)
    * is far under the min distance to any non-corner site (1.155), so 4
    * candidates are exact with a wide FP margin. Ties are measure-zero
    * cell-boundary inputs.
    *
    * Returns the nearest center packed as axial coords:
    * (i << 32) | (j & 0xFFFFFFFF), both offset by +2^30 to stay
    * non-negative (coords at res 15 reach a few million, well inside
    * 31 bits). Callers unpack and normalize. */
  @inline private def hex2dToAxialPacked(x: Double, y: Double): Long = {
    val jf = y / Sin60
    val if_ = x + jf * 0.5
    val i0 = floor(if_).toLong
    val j0 = floor(jf).toLong
    var bi = i0; var bj = j0; var bd = Double.MaxValue
    var c = 0
    while (c < 4) {
      val ci = i0 + (c & 1); val cj = j0 + (c >> 1)
      val cx = ci.toDouble - 0.5 * cj.toDouble
      val cy = cj.toDouble * Sin60
      val d = (cx - x) * (cx - x) + (cy - y) * (cy - y)
      if (d < bd) { bd = d; bi = ci; bj = cj }
      c += 1
    }
    ((bi + 1073741824L) << 32) | (bj + 1073741824L)
  }

  private def hex2dToIjk(x: Double, y: Double): (Long, Long, Long) = {
    val p = hex2dToAxialPacked(x, y)
    normI((p >>> 32) - 1073741824L, (p & 0xFFFFFFFFL) - 1073741824L, 0L)
  }

  /** Aperture-7 up-aggregation, counter-clockwise variant (child grid →
    * parent grid for Class III child resolutions). */
  @inline private def upAp7(i0: Long, j0: Long, k0: Long): (Long, Long, Long) = {
    val i = (i0 - k0).toDouble
    val j = (j0 - k0).toDouble
    normI(floor((3.0 * i - j) / 7.0 + 0.5).toLong,
      floor((i + 2.0 * j) / 7.0 + 0.5).toLong, 0L)
  }

  /** Aperture-7 up-aggregation, clockwise variant (Class II). */
  @inline private def upAp7r(i0: Long, j0: Long, k0: Long): (Long, Long, Long) = {
    val i = (i0 - k0).toDouble
    val j = (j0 - k0).toDouble
    normI(floor((2.0 * i + j) / 7.0 + 0.5).toLong,
      floor((3.0 * j - i) / 7.0 + 0.5).toLong, 0L)
  }

  /** Aperture-7 down-scalings (parent center in child grid). */
  @inline private def downAp7(i: Long, j: Long, k: Long): (Long, Long, Long) =
    normI(3 * i + 1 * j, 3 * j + 1 * k, 1 * i + 3 * k)

  @inline private def downAp7r(i: Long, j: Long, k: Long): (Long, Long, Long) =
    normI(3 * i + 1 * k, 1 * i + 3 * j, 1 * j + 3 * k)

  @inline private def unitIjkToDigit(i: Long, j: Long, k: Long): Int = {
    require(i >= 0 && i <= 1 && j >= 0 && j <= 1 && k >= 0 && k <= 1,
      s"non-unit ijk ($i,$j,$k)")
    (4 * i + 2 * j + k).toInt
  }

  // ------------------------------------------------------------------
  // Digit rotations in index space. CCW cycle: I→IJ→J→JK→K→IK→I.
  // ------------------------------------------------------------------
  private val CcwDigit: Array[Int] = Array(0, 5, 3, 1, 6, 4, 2, 7)
  private val CwDigit: Array[Int] = Array(0, 3, 6, 2, 5, 1, 4, 7)

  @inline def getResolution(h: Long): Int = ((h >>> 52) & 0xF).toInt
  @inline def getBaseCell(h: Long): Int = ((h >>> 45) & 0x7F).toInt
  @inline private def getDigit(h: Long, r: Int): Int =
    ((h >>> ((MaxRes - r) * 3)) & 7L).toInt
  @inline private def setDigit(h: Long, r: Int, d: Int): Long = {
    val sh = (MaxRes - r) * 3
    (h & ~(7L << sh)) | (d.toLong << sh)
  }

  private def leadingNonZeroDigit(h: Long): Int = {
    val res = getResolution(h)
    var r = 1
    while (r <= res) {
      val d = getDigit(h, r)
      if (d != 0) return d
      r += 1
    }
    0
  }

  private def rotate60(h: Long, tab: Array[Int]): Long = {
    var out = h
    val res = getResolution(h)
    var r = 1
    while (r <= res) {
      out = setDigit(out, r, tab(getDigit(out, r)))
      r += 1
    }
    out
  }

  /** Pentagon ccw rotation: rotates digits ccw while skipping the
    * deleted K subsequence (leading K is rotated through). */
  private def rotatePent60ccw(h0: Long): Long = {
    var h = h0
    var foundFirst = false
    val res = getResolution(h)
    var r = 1
    while (r <= res) {
      h = setDigit(h, r, CcwDigit(getDigit(h, r)))
      if (!foundFirst && getDigit(h, r) != 0) {
        foundFirst = true
        if (leadingNonZeroDigit(h) == 1) h = rotate60(h, CcwDigit)
      }
      r += 1
    }
    h
  }

  // ------------------------------------------------------------------
  // Forward projection: geo → (face, hex2d at res)
  // ------------------------------------------------------------------
  private val FaceX: Array[Double] =
    Array.tabulate(20)(f => cos(FaceLat(f)) * cos(FaceLng(f)))
  private val FaceY: Array[Double] =
    Array.tabulate(20)(f => cos(FaceLat(f)) * sin(FaceLng(f)))
  private val FaceZ: Array[Double] =
    Array.tabulate(20)(f => sin(FaceLat(f)))

  @inline private def nearestFace(latR: Double, lngR: Double): Int = {
    val x = cos(latR) * cos(lngR)
    val y = cos(latR) * sin(lngR)
    val z = sin(latR)
    var best = 0
    var bestDot = -2.0
    var f = 0
    while (f < 20) {
      val d = x * FaceX(f) + y * FaceY(f) + z * FaceZ(f)
      if (d > bestDot) { bestDot = d; best = f }
      f += 1
    }
    best
  }

  /** geo (radians) → (face, hex2d x, hex2d y) at `res`. */
  private def geoToHex2d(latR: Double, lngR: Double,
      res: Int): (Int, Double, Double) = {
    val face = nearestFace(latR, lngR)
    val dot = max(-1.0, min(1.0,
      cos(latR) * cos(lngR) * FaceX(face) +
        cos(latR) * sin(lngR) * FaceY(face) + sin(latR) * FaceZ(face)))
    val r = acos(dot)
    if (r < 1e-15) return (face, 0.0, 0.0)
    val az = geoAzimuth(FaceLat(face), FaceLng(face), latR, lngR)
    var theta = posAngle(FaceAz0(face) - posAngle(az))
    if ((res & 1) == 1) theta = posAngle(theta - Ap7Rot) // Class III
    var rr = tan(r) / Res0UGnomonic
    var i = 0
    while (i < res) { rr *= Sqrt7; i += 1 }
    (face, rr * cos(theta), rr * sin(theta))
  }

  /** Inverse at res 0 (derivation only): (face, hex2d) → geo radians. */
  private def hex2dToGeoRes0(face: Int, x: Double, y: Double): (Double, Double) = {
    val r = sqrt(x * x + y * y)
    if (r < 1e-15) return (FaceLat(face), FaceLng(face))
    val theta = atan2(y, x)
    val rr = atan(r * Res0UGnomonic)
    val az = posAngle(FaceAz0(face) - theta)
    geoAzDistance(FaceLat(face), FaceLng(face), az, rr)
  }

  // ------------------------------------------------------------------
  // Base-cell table derivation (replaces the C library's hand-authored
  // baseCellData / faceIjkBaseCells)
  // ------------------------------------------------------------------
  /** Table entry: base cell number and ccw 60° rotation count for a
    * (face, normalized res-0 ijk) appearance; -1 = unreachable coord. */
  private val TabBc = Array.fill(20 * 27)(-1)
  private val TabRot = Array.fill(20 * 27)(0)
  private val IsPent = new Array[Boolean](NumBaseCells)
  /** cwOffsetPent: for pentagon bc, faces where the leading-K escape
    * rotates CW instead of CCW. Keyed bc*32+face. */
  private val PentCwOffset = new Array[Boolean](NumBaseCells * 32)
  /** Pentagon cell centers (icosahedron vertices), for the rotation
    * consistency search. */
  private val PentLat = new Array[Double](NumBaseCells)
  private val PentLng = new Array[Double](NumBaseCells)

  @inline private def tabIdx(f: Int, i: Long, j: Long, k: Long): Int =
    ((f * 3 + i.toInt) * 3 + j.toInt) * 3 + k.toInt

  /** Derivation — see object scaladoc. Runs once at class init (<10 ms);
    * every `require` is a self-check of the recalled geometry constants
    * and the published numbering rule. */
  private def deriveTables(): Unit = {
    // 19 normalized res-0 coords per face (min component 0, max ≤ 2)
    val coords = for {
      i <- 0 to 2; j <- 0 to 2; k <- 0 to 2
      if min(i, min(j, k)) == 0
    } yield (i.toLong, j.toLong, k.toLong)
    require(coords.size == 19)

    case class App(f: Int, i: Long, j: Long, k: Long) {
      lazy val center: (Double, Double) = {
        val (x, y) = ijkToHex2d(i, j, k)
        hex2dToGeoRes0(f, x, y)
      }
      lazy val center3: (Double, Double, Double) = {
        val (la, lo) = center
        (cos(la) * cos(lo), cos(la) * sin(lo), sin(la))
      }
    }
    val apps: IndexedSeq[App] = for {
      f <- 0 until 20; (i, j, k) <- coords
    } yield App(f, i, j, k)
    val appIdx: Map[(Int, Long, Long, Long), Int] =
      apps.zipWithIndex.map { case (a, n) => ((a.f, a.i, a.j, a.k), n) }.toMap

    // union-find over appearances
    val parent = Array.tabulate(apps.size)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(a: Int, b: Int): Unit = { parent(find(a)) = find(b) }

    // link 1: identical centers (true shared-boundary appearances)
    for (a <- apps.indices; b <- (a + 1) until apps.size) {
      val (ax, ay, az) = apps(a).center3
      val (bx, by, bz) = apps(b).center3
      val d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by) +
        (az - bz) * (az - bz)
      if (d2 < 1e-18) union(a, b)
    }
    // link 2: re-resolution (spillover appearances → canonical cell).
    // An appearance is EXACT (its center is the true cell center) iff it
    // re-resolves to an appearance with the same center; spillover
    // appearances land a gnomonic-distortion displacement away.
    val exactApp = new Array[Boolean](apps.size)
    for (n <- apps.indices) {
      val a = apps(n)
      val (la, lo) = a.center
      val (f2, x2, y2) = geoToHex2d(la, lo, 0)
      val (ri, rj, rk) = hex2dToIjk(x2, y2)
      val m = appIdx.getOrElse((f2, ri, rj, rk),
        sys.error(s"re-resolved coord off-table: $a -> ($f2,$ri,$rj,$rk)"))
      union(n, m)
      val (ax, ay, az) = a.center3
      val (bx, by, bz) = apps(m).center3
      val d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by) +
        (az - bz) * (az - bz)
      exactApp(n) = d2 < 1e-18
    }

    val clusters: Map[Int, IndexedSeq[Int]] =
      apps.indices.groupBy(find).map { case (r, m) => (r, m.toIndexedSeq) }
    require(clusters.size == NumBaseCells,
      s"derived ${clusters.size} base cells, want $NumBaseCells")

    // representative = an exact-center appearance
    val reps: Map[Int, App] = clusters.map { case (root, members) =>
      val self = members.filter(exactApp)
      require(self.nonEmpty, s"cluster $root has no exact-center member")
      (root, apps(self.minBy(n => (apps(n).f, apps(n).i, apps(n).j, apps(n).k))))
    }

    // pentagon ⟺ center is an icosahedron vertex ⟺ ≥3 equidistant faces
    def isVertex(a: App): Boolean = {
      val (x, y, z) = a.center3
      val dots: IndexedSeq[Double] =
        (0 until 20).map(f => x * FaceX(f) + y * FaceY(f) + z * FaceZ(f))
      val mx = dots.max
      dots.count(d => d > mx - 1e-12) >= 3
    }

    // number by descending latitude of the representative center
    val ordered = clusters.keys.toIndexedSeq.sortBy(r => -reps(r).center._1)
    val lats = ordered.map(r => reps(r).center._1)
    lats.sliding(2).foreach { case Seq(a, b) =>
      require(a - b > 1e-9, s"ambiguous latitude ordering: $a vs $b")
    }
    val cellNum: Map[Int, Int] = ordered.zipWithIndex.toMap

    val pentNums = ordered.zipWithIndex.collect {
      case (r, n) if isVertex(reps(r)) => n
    }.toSet
    require(pentNums == PentagonCells,
      s"pentagon numbering mismatch: derived $pentNums")
    for (n <- pentNums) IsPent(n) = true
    for ((root, num) <- cellNum if pentNums.contains(num)) {
      val (la, lo) = reps(root).center
      PentLat(num) = la
      PentLng(num) = lo
    }

    // home appearance per cell: hexagons = lowest-face exact appearance;
    // pentagons = lowest face where the vertex is that face's i-vertex
    // (coord (2,0,0) — the direction FaceAz0 points at).
    val homeOf: Map[Int, App] = clusters.map { case (root, members) =>
      val rep3 = reps(root).center3
      def exact(n: Int): Boolean = {
        val (x, y, z) = apps(n).center3
        val d2 = (x - rep3._1) * (x - rep3._1) + (y - rep3._2) * (y - rep3._2) +
          (z - rep3._3) * (z - rep3._3)
        d2 < 1e-18
      }
      val ex = members.filter(exact).map(apps(_))
      val home =
        if (pentNums.contains(cellNum(root))) {
          val iv = ex.filter(a => a.i == 2 && a.j == 0 && a.k == 0)
          require(iv.nonEmpty, s"pentagon ${cellNum(root)} has no i-vertex face")
          iv.minBy(_.f)
        } else ex.minBy(_.f)
      (root, home)
    }

    // bearing of the face grid's +i axis at a given geo point, measured
    // through face `f`'s chart (finite difference in the gnomonic plane)
    def iAxisBearing(f: Int, latR: Double, lngR: Double): Double = {
      val az = geoAzimuth(FaceLat(f), FaceLng(f), latR, lngR)
      val dot = max(-1.0, min(1.0,
        cos(latR) * cos(lngR) * FaceX(f) + cos(latR) * sin(lngR) * FaceY(f) +
          sin(latR) * FaceZ(f)))
      val theta = posAngle(FaceAz0(f) - posAngle(az))
      val r = tan(acos(dot)) / Res0UGnomonic
      val (x, y) = (r * cos(theta), r * sin(theta))
      val eps = 1e-7
      val (la2, lo2) = hex2dToGeoRes0(f, x + eps, y)
      geoAzimuth(latR, lngR, la2, lo2)
    }

    // fill the runtime table
    for ((root, members) <- clusters) {
      val num = cellNum(root)
      val home = homeOf(root)
      val (hLat, hLng) = reps(root).center
      val betaHome = iAxisBearing(home.f, hLat, hLng)
      for (n <- members) {
        val a = apps(n)
        val idx = tabIdx(a.f, a.i, a.j, a.k)
        TabBc(idx) = num
        if (a.f == home.f && a.i == home.i && a.j == home.j && a.k == home.k) {
          TabRot(idx) = 0
        } else if (!pentNums.contains(num)) {
          // rotation via bearing mismatch at THIS appearance's center
          // (spillovers measure at their own distorted center through
          // their own chart — the frames' relative twist is what counts)
          val (aLat, aLng) = a.center
          val bH = iAxisBearing(home.f, aLat, aLng)
          val bF = iAxisBearing(a.f, aLat, aLng)
          val diff = posAngle(bF - bH)
          val nRot = round(diff / (PI / 3.0)).toInt % 6
          val resid = abs(diff - nRot * (PI / 3.0))
          // charts twist slightly off the exact 60° multiple (gnomonic
          // distortion at off-boundary measurement points) but stay far
          // from the 30° rounding ambiguity; boundary-consistency tests
          // in H3Spec validate every entry end-to-end
          require(resid < 0.45 || abs(resid - TwoPi) < 0.45,
            f"ambiguous grid rotation at $a: $resid%.2e")
          // NEGATED (round 12): bearings are azimuths (clockwise), the
          // digit rotation cycle is counter-clockwise — the raw
          // bearing quantization yields the INVERSE rotation. The
          // digit-level cross-chart consistency law (for edge isometry
          // rotation c: rot_F − rot_G ≡ +c (mod 6), proven via the
          // aperture-7/isometry commutation and verified exhaustively
          // by probeCoordConsistency) picks the sign: with the raw
          // nRot every c∈{1,5} edge pair violates it by 2c, with the
          // negation all pairs satisfy it. c=3 edges (280 of 420 slot
          // pairs) are sign-blind, which is how the raw sign survived
          // ten rounds of single-chart tests.
          TabRot(idx) = (6 - nRot) % 6
        } else {
          // pentagons: the 5 faces fan at 72°, not 60° — resolved by the
          // consistency search below, -1 until then
          TabRot(idx) = -1
        }
      }
    }
  }

  deriveTables()

  // ------------------------------------------------------------------
  // Core pipeline: raw chart-local digits, then table-driven finishing
  // ------------------------------------------------------------------
  /** geo (radians) → (face, res-0 i/j/k, raw index). The raw index has
    * mode/res/digits set with digits in `face`'s own grid orientation;
    * base-cell bits are still all-1 and no rotation has been applied.
    *
    * Results are returned through [[RawOut]] to keep the scan hot path
    * allocation-free: the digit loop below runs `res` iterations per
    * row and is written against primitive locals only (the tuple-based
    * helper algebra above is reserved for derivation-time use). */
  private final class RawOut {
    var face: Int = 0
    var i: Long = 0L; var j: Long = 0L; var k: Long = 0L
    var h: Long = 0L
    // res-N chart-local lattice coords of the landed cell (pre-digit
    // aggregation) — the consensus path unprojects these to score a
    // candidate chart by its own lattice-center distance
    var li: Long = 0L; var lj: Long = 0L; var lk: Long = 0L
  }
  private val rawOutTL =
    ThreadLocal.withInitial[RawOut](() => new RawOut)

  private def rawIndexInto(latR: Double, lngR: Double, res: Int,
      out: RawOut): Unit =
    rawIndexOnFace(latR, lngR, res, nearestFace(latR, lngR), out)

  /** [[rawIndexInto]] with the chart face given — the consensus band
    * in [[latLngToCell]] trials co-near charts explicitly. */
  private def rawIndexOnFace(latR: Double, lngR: Double, res: Int,
      faceArg: Int, out: RawOut): Unit = {
    // geoToHex2d, inlined projection on the given face
    val face = faceArg
    val cosLat = cos(latR)
    val dot = max(-1.0, min(1.0,
      cosLat * cos(lngR) * FaceX(face) +
        cosLat * sin(lngR) * FaceY(face) + sin(latR) * FaceZ(face)))
    val rAng = acos(dot)
    var x = 0.0; var y = 0.0
    if (rAng >= 1e-15) {
      val az = geoAzimuth(FaceLat(face), FaceLng(face), latR, lngR)
      var theta = posAngle(FaceAz0(face) - posAngle(az))
      if ((res & 1) == 1) theta = posAngle(theta - Ap7Rot) // Class III
      var rr = tan(rAng) / Res0UGnomonic
      var n = 0
      while (n < res) { rr *= Sqrt7; n += 1 }
      x = rr * cos(theta); y = rr * sin(theta)
    }
    // nearest hex center (4-corner exact rounding), normalized ijk
    val packed = hex2dToAxialPacked(x, y)
    var i = (packed >>> 32) - 1073741824L
    var j = (packed & 0xFFFFFFFFL) - 1073741824L
    var k = 0L
    var m = min(i, min(j, k)); i -= m; j -= m; k -= m
    out.li = i; out.lj = j; out.lk = k
    // index skeleton: mode 1, res, all digits 7
    var h = (1L << 59) | (res.toLong << 52) | ((1L << 45) - 1)
    var r = res
    while (r > 0) {
      val li = i; val lj = j; val lk = k
      // up-aggregate on axial (i-k, j-k), then normalize
      val ai = (i - k).toDouble
      val aj = (j - k).toDouble
      var ui = 0L; var uj = 0L
      if ((r & 1) == 1) { // Class III (ccw)
        ui = floor((3.0 * ai - aj) / 7.0 + 0.5).toLong
        uj = floor((ai + 2.0 * aj) / 7.0 + 0.5).toLong
      } else { // Class II (cw)
        ui = floor((2.0 * ai + aj) / 7.0 + 0.5).toLong
        uj = floor((3.0 * aj - ai) / 7.0 + 0.5).toLong
      }
      var uk = 0L
      m = min(ui, min(uj, uk)); ui -= m; uj -= m; uk -= m
      // down-scale the parent back to the child grid, normalized
      var ci = 0L; var cj = 0L; var ck = 0L
      if ((r & 1) == 1) { ci = 3 * ui + uj; cj = 3 * uj + uk; ck = ui + 3 * uk }
      else { ci = 3 * ui + uk; cj = ui + 3 * uj; ck = uj + 3 * uk }
      m = min(ci, min(cj, ck)); ci -= m; cj -= m; ck -= m
      // unit digit = child − parent-center
      var di = li - ci; var dj = lj - cj; var dk = lk - ck
      m = min(di, min(dj, dk)); di -= m; dj -= m; dk -= m
      if (((di | dj | dk) & ~1L) != 0L)
        throw new IllegalStateException(
          s"non-unit digit ijk ($di,$dj,$dk) at res $r")
      h = setDigit(h, r, (4 * di + 2 * dj + dk).toInt)
      i = ui; j = uj; k = uk
      r -= 1
    }
    require(i >= 0 && i <= 2 && j >= 0 && j <= 2 && k >= 0 && k <= 2,
      s"res-0 coords out of range: ($i,$j,$k) face $face")
    out.face = face; out.i = i; out.j = j; out.k = k; out.h = h
  }

  private def rawIndex(latR: Double, lngR: Double,
      res: Int): (Int, Long, Long, Long, Long) = {
    val o = rawOutTL.get()
    rawIndexInto(latR, lngR, res, o)
    (o.face, o.i, o.j, o.k, o.h)
  }

  /** Apply base-cell number + orientation to a raw index. Parameterized
    * so the pentagon consistency search can trial candidate rotations;
    * runtime calls always pass the resolved table values. */
  @inline private def finishWith(hRaw: Long, bc: Int, rot: Int,
      cwEscape: Boolean): Long = {
    var h = (hRaw & ~(0x7FL << 45)) | (bc.toLong << 45)
    if (IsPent(bc)) {
      if (leadingNonZeroDigit(h) == 1) {
        h = if (cwEscape) rotate60(h, CwDigit) else rotate60(h, CcwDigit)
      }
      var n = 0
      while (n < rot) { h = rotatePent60ccw(h); n += 1 }
    } else {
      var n = 0
      while (n < rot) { h = rotate60(h, CcwDigit); n += 1 }
    }
    h
  }

  // ------------------------------------------------------------------
  // Pentagon rotation resolution (the consistency search promised in
  // the object scaladoc). The 5 faces around an icosahedron vertex fan
  // at 72°, so a pentagon appearance's grid rotation cannot be read off
  // a 60°-quantized bearing mismatch the way hexagon appearances can.
  // Instead it is pinned empirically: a point pair straddling the
  // boundary between two faces' nearest-face regions (1e-9 rad apart,
  // interior to the same res-4 subcell with probability 1) MUST index
  // identically through both charts. Walking the fan from the home face
  // (rotation 0 by definition of canonical orientation) and brute-
  // forcing each next face's (rot ∈ 0..5, cwEscape ∈ {t,f}) against the
  // shared straddle pairs pins a unique assignment; a final global pass
  // re-validates every pair and checks no finished index carries a
  // leading K digit (the deleted subsequence).
  // ------------------------------------------------------------------
  private def resolvePentagons(): Unit = {
    // Class III only: at even (Class II) resolutions the face boundary
    // rays from a pentagon vertex are hex-lattice mirror lines (30° +
    // 60°k from the chart axes) and run exactly along subcell edges, so
    // a straddling pair legitimately sits in two different subcells and
    // can never agree. The Class III grids are rotated ±19.1° off the
    // face axes, leaving boundary pairs generically interior to one
    // subcell — which is what the consistency constraint needs. Two
    // resolutions: deeper digits discriminate rotations that shallow
    // near-vertex (leading-zero-heavy) pairs cannot.
    val SampleResList = Array(5, 7)
    val NAz = 2048
    val Radii = Array(0.03, 0.045, 0.06, 0.08, 0.095, 0.115) // rad

    for (bc <- 0 until NumBaseCells if IsPent(bc)) {
      val vLat = PentLat(bc); val vLng = PentLng(bc)

      // sample: (face, i, j, k, rawH); az-major order per radius
      case class S(face: Int, i: Long, j: Long, k: Long, raw: Long)
      def sampleAt(az: Double, rho: Double, res: Int): Option[S] = {
        val (la, lo) = geoAzDistance(vLat, vLng, az, rho)
        val (f, i, j, k, raw) = rawIndex(la, lo, res)
        if (TabBc(tabIdx(f, i, j, k)) == bc) Some(S(f, i, j, k, raw)) else None
      }

      // ring samples, computed once per (res, radius) and reused by the
      // pair builder below and the global validation pass at the end
      val rings: IndexedSeq[(Int, Double, Array[S])] = for {
        res <- SampleResList.toIndexedSeq; rho <- Radii.toIndexedSeq
      } yield (res, rho, Array.tabulate(NAz) { n =>
        sampleAt(n * TwoPi / NAz, rho, res).orNull
      })

      // straddle pairs across face-region boundaries: bisect between
      // consecutive ring samples that landed on different faces
      val pairs = scala.collection.mutable.ArrayBuffer.empty[(S, S)]
      for ((res, rho, ring) <- rings; n <- 0 until NAz) {
        val a = ring(n); val b = ring((n + 1) % NAz)
        if (a != null && b != null && a.face != b.face) {
          var lo = n * TwoPi / NAz; var hi = (n + 1) * TwoPi / NAz
          var sLo = a; var sHi = b
          var it = 0
          while (hi - lo > 1e-9 && it < 64) {
            val mid = (lo + hi) / 2
            sampleAt(mid, rho, res) match {
              case Some(m) if m.face == sLo.face => lo = mid; sLo = m
              case Some(m) => hi = mid; sHi = m
              case None => it = 64 // fell out of the cell; drop pair
            }
            it += 1
          }
          if (hi - lo <= 1e-9 && sLo.face != sHi.face) pairs += ((sLo, sHi))
        }
      }

      // member appearances seen in samples, grouped by face; fan order
      // around the vertex by face-center azimuth
      val faces = pairs.flatMap(p => Seq(p._1.face, p._2.face)).distinct
      val homeFace = {
        // home = the appearance deriveTables marked rot 0 (i-vertex face)
        val fs = for {
          f <- 0 until 20; i <- 0 to 2; j <- 0 to 2; k <- 0 to 2
          if TabBc(tabIdx(f, i, j, k)) == bc && TabRot(tabIdx(f, i, j, k)) == 0
        } yield f
        require(fs.nonEmpty, s"pentagon $bc: no home appearance")
        fs.head
      }
      require(faces.contains(homeFace),
        s"pentagon $bc: home face $homeFace not reached by sampling")

      // candidate state per face: (rot, cwEscape)
      val assign = scala.collection.mutable.Map.empty[Int, (Int, Boolean)]
      // home rot is 0 by construction; its cw flag joins the first edge
      // search below
      def finishedOf(s: S, st: (Int, Boolean)): Long =
        finishWith(s.raw, bc, st._1, st._2)

      def consistent(p: (S, S), stA: (Int, Boolean), stB: (Int, Boolean)): Boolean =
        finishedOf(p._1, stA) == finishedOf(p._2, stB)

      // Joint CSP over the whole fan. A single boundary curve's digit
      // patterns can be rotation-degenerate (the sampled sliver maps
      // into a narrow digit sector where escape+rot compositions
      // coincide), so greedy edge-at-a-time propagation can stall on an
      // ambiguous edge. Enumerating assignments over all faces at once
      // uses BOTH edges of every face simultaneously, which pins the
      // fan uniquely. Home rot is 0 by definition; each other face has
      // rot ∈ 0..5 and every face an independent cwEscape flag.
      // cw flags are only constrained by leading-K samples; a genuinely
      // unconstrained flag survives with both values — survivors must
      // then agree on all rots, and the ccw default (false) is taken.
      val otherFaces = faces.filterNot(_ == homeFace).toIndexedSeq
      val edges: Map[(Int, Int), IndexedSeq[(S, S)]] = pairs.toIndexedSeq
        .groupBy(p => (min(p._1.face, p._2.face), max(p._1.face, p._2.face)))
      // rot ∈ 0..4: the pentagon digit rotation has order 5 (five
      // applications step through the five non-deleted sectors and
      // return — rot 5 ≡ rot 0), so 5 would only manufacture a
      // spurious ambiguous duplicate of 0
      val combos: IndexedSeq[(Int, Boolean)] = for {
        rot <- 0 to 4; cw <- IndexedSeq(false, true)
      } yield (rot, cw)
      val homeCombos: IndexedSeq[(Int, Boolean)] =
        IndexedSeq((0, false), (0, true))
      def combosOf(f: Int): IndexedSeq[(Int, Boolean)] =
        if (f == homeFace) homeCombos else combos
      // per-edge compatibility tables
      val compat: Map[(Int, Int), Array[Array[Boolean]]] = edges.map {
        case ((fA, fB), ps) =>
          val ca = combosOf(fA); val cb = combosOf(fB)
          val t = Array.ofDim[Boolean](ca.size, cb.size)
          for (ia <- ca.indices; ib <- cb.indices) {
            t(ia)(ib) = ps.forall { p =>
              val (a, b) = if (p._1.face == fA) (p._1, p._2) else (p._2, p._1)
              consistent((a, b), ca(ia), cb(ib))
            }
          }
          ((fA, fB), t)
      }
      // enumerate joint assignments (≤ 2 × 12^4 = 41k)
      val faceIdx: Map[Int, Int] =
        (homeFace +: otherFaces).zipWithIndex.toMap
      val survivors = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      val cur = new Array[Int]((otherFaces.size + 1))
      def rec(d: Int): Unit = {
        if (d > otherFaces.size) { survivors += cur.clone(); return }
        val f = if (d == 0) homeFace else otherFaces(d - 1)
        val cs = combosOf(f)
        var ci = 0
        while (ci < cs.size) {
          cur(d) = ci
          // check edges to already-assigned faces
          val ok = edges.keys.forall { case (fA, fB) =>
            val dA = faceIdx(fA); val dB = faceIdx(fB)
            if (dA > d || dB > d) true
            else {
              val t = compat((fA, fB))
              t(cur(dA))(cur(dB))
            }
          }
          if (ok) rec(d + 1)
          ci += 1
        }
      }
      rec(0)
      if (System.getProperty("graft.h3.debug") != null) {
        println(s"pent $bc home=$homeFace faces=${faces.toList} " +
          s"edges=${edges.map { case (e, ps) => s"$e:${ps.size}" }.toList}")
        for (sv <- survivors.take(8)) {
          val a = (0 to otherFaces.size).map { d =>
            val f = if (d == 0) homeFace else otherFaces(d - 1)
            s"$f->${combosOf(f)(sv(d))}"
          }
          println(s"  survivor: ${a.mkString(" ")}")
        }
      }
      require(survivors.nonEmpty, s"pentagon $bc: fan CSP has no solution")
      // rots must be pinned uniquely; cw flags may be unconstrained
      for (d <- 0 to otherFaces.size) {
        val f = if (d == 0) homeFace else otherFaces(d - 1)
        val rots = survivors.map(a => combosOf(f)(a(d))._1).distinct
        require(rots.size == 1,
          s"pentagon $bc: rotation ambiguous on face $f: $rots")
      }
      // deterministic pick: the first survivor (enumeration order puts
      // cw=false first at every level)
      val picked = survivors.head
      for (d <- 0 to otherFaces.size) {
        val f = if (d == 0) homeFace else otherFaces(d - 1)
        assign(f) = combosOf(f)(picked(d))
      }

      // global validation: every straddle pair agrees; no finished index
      // leads with K
      for (p <- pairs) {
        require(consistent(p, assign(p._1.face), assign(p._2.face)),
          s"pentagon $bc: global pair validation failed on " +
            s"${p._1.face}-${p._2.face}")
      }
      for ((_, _, ring) <- rings; s <- ring if s != null) {
        val fin = finishedOf(s, assign(s.face))
        require(leadingNonZeroDigit(fin) != 1,
          s"pentagon $bc: finished index leads with K on face ${s.face}")
      }

      // write through to the runtime tables: every table slot of this bc
      // on an assigned face gets that face's rotation
      for {
        f <- faces; i <- 0 to 2; j <- 0 to 2; k <- 0 to 2
        idx = tabIdx(f, i, j, k) if TabBc(idx) == bc
      } {
        val (rot, cw) = assign(f)
        TabRot(idx) = rot
        if (cw) PentCwOffset(bc * 32 + f) = true
      }
    }
  }

  resolvePentagons()

  // ------------------------------------------------------------------
  // Face-neighbor lattice maps — the derived equivalent of H3's
  // faceNeighbors / _adjustOverage tables (h3lib faceijk.c). For each
  // face edge, the adjacent face and the EXACT lattice isometry
  // (60°·c ccw rotation + integer axial translation, per res) that
  // carries chart-local coordinates past the edge onto the neighbor's
  // chart. Why an exact integer map exists: the two gnomonic charts
  // agree exactly ON the shared icosahedron edge, both res-r lattices
  // restricted to the edge line are the same 1D lattice (they share
  // the descended vertex/midpoint points and have equal spacing), and
  // both charts are consistently oriented — so the correspondence that
  // is the identity on the edge is an orientation-preserving lattice
  // isometry. Off the edge the two charts' lattice POINTS drift apart
  // geometrically (quadratic gnomonic mismatch), but the map is used
  // as a LABEL correspondence: a coordinate assembled past face F's
  // region is re-anchored to the chart that actually owns that region,
  // where assembly agrees with the forward definition of identity.
  // ------------------------------------------------------------------
  /** Chart-local axial coords of a res-0 lattice point at `res`:
    * the zero-digit alternating aperture-7 descent of [[descendDigits]]
    * in axial form (downAp7 at odd steps, downAp7r at even). */
  private def descend0Axial(a0: Long, b0: Long, res: Int): (Long, Long) = {
    var a = a0; var b = b0
    var r = 1
    while (r <= res) {
      if ((r & 1) == 1) { val t = 2 * a + b; b = -a + 3 * b; a = t }
      else { val t = 3 * a - b; b = a + 2 * b; a = t }
      r += 1
    }
    (a, b)
  }

  /** Res-0 face vertices (pentagon centers) in axial coords: the
    * normalized ijk (2,0,0), (0,2,0), (0,0,2). Edge e joins vertex e
    * and vertex (e+1)%3. */
  private val FaceVertAxial: Array[(Long, Long)] =
    Array((2L, 0L), (0L, 2L), (-2L, -2L))

  /** Face-region triangle vertices per res (axial, Long) — the face's
    * own chart covers exactly this triangle; coordinates outside it
    * belong to a neighboring face's chart. */
  private val TriW: Array[Array[(Long, Long)]] =
    Array.tabulate(MaxRes + 1) { r =>
      FaceVertAxial.map { case (a, b) => descend0Axial(a, b, r) }
    }

  /** EdgeFace(f)(e): the face adjacent to `f` across edge `e`. */
  private val EdgeFace = Array.ofDim[Int](20, 3)
  /** Per (face, edge, res): ccw-60° rotation count and axial
    * translation of the F→neighbor chart map p_G = R^c(p_F) + T. */
  private val EdgeRot = Array.ofDim[Int](20, 3, MaxRes + 1)
  private val EdgeTA = Array.ofDim[Long](20, 3, MaxRes + 1)
  private val EdgeTB = Array.ofDim[Long](20, 3, MaxRes + 1)

  private def deriveFaceNeighbors(): Unit = {
    // physical positions of each face's three vertices
    val pos = Array.ofDim[Double](20, 3, 3)
    for (f <- 0 until 20; v <- 0 until 3) {
      val (a, b) = FaceVertAxial(v)
      val (la, lo) = hex2dToGeoRes0(f, a.toDouble - 0.5 * b, b * Sin60)
      pos(f)(v)(0) = cos(la) * cos(lo)
      pos(f)(v)(1) = cos(la) * sin(lo)
      pos(f)(v)(2) = sin(la)
    }
    @inline def same(p: Array[Double], q: Array[Double]): Boolean = {
      val dx = p(0) - q(0); val dy = p(1) - q(1); val dz = p(2) - q(2)
      dx * dx + dy * dy + dz * dz < 1e-18
    }
    @inline def rotC(a0: Long, b0: Long, c: Int): (Long, Long) = {
      var a = a0; var b = b0
      var k = 0
      while (k < c) { val t = a - b; b = a; a = t; k += 1 } // ccw60 axial
      (a, b)
    }
    for (f <- 0 until 20; e <- 0 until 3) {
      val pA = pos(f)(e); val pB = pos(f)((e + 1) % 3)
      val gs = for {
        g <- 0 until 20 if g != f
        va <- 0 until 3 if same(pos(g)(va), pA)
        vb <- 0 until 3 if same(pos(g)(vb), pB)
      } yield (g, va, vb)
      require(gs.size == 1, s"face $f edge $e: adjacency not unique: $gs")
      val (g, va, vb) = gs.head
      EdgeFace(f)(e) = g
      for (r <- 0 to MaxRes) {
        val aF = descend0Axial(FaceVertAxial(e)._1, FaceVertAxial(e)._2, r)
        val bF = descend0Axial(FaceVertAxial((e + 1) % 3)._1,
          FaceVertAxial((e + 1) % 3)._2, r)
        val aG = descend0Axial(FaceVertAxial(va)._1, FaceVertAxial(va)._2, r)
        val bG = descend0Axial(FaceVertAxial(vb)._1, FaceVertAxial(vb)._2, r)
        val dF = (bF._1 - aF._1, bF._2 - aF._2)
        val dG = (bG._1 - aG._1, bG._2 - aG._2)
        var c = -1
        for (k <- 0 to 5) {
          val (ra, rb) = rotC(dF._1, dF._2, k)
          if (ra == dG._1 && rb == dG._2) {
            require(c < 0, s"face $f edge $e res $r: rotation ambiguous")
            c = k
          }
        }
        require(c >= 0, s"face $f edge $e res $r: no 60° rotation maps the edge")
        val (xa, xb) = rotC(aF._1, aF._2, c)
        EdgeRot(f)(e)(r) = c
        EdgeTA(f)(e)(r) = aG._1 - xa
        EdgeTB(f)(e)(r) = aG._2 - xb
        // second endpoint must map exactly under the same isometry
        val (ya, yb) = rotC(bF._1, bF._2, c)
        require(ya + EdgeTA(f)(e)(r) == bG._1 && yb + EdgeTB(f)(e)(r) == bG._2,
          s"face $f edge $e res $r: endpoint B does not map")
      }
      // geometric cross-check at a few res: the shared-edge midpoint
      // lattice point must unproject to the SAME physical point through
      // both charts after mapping (catches orientation/parity errors)
      for (r <- Seq(0, 1, 2, 5)) {
        val m0a = (FaceVertAxial(e)._1 + FaceVertAxial((e + 1) % 3)._1) / 2
        val m0b = (FaceVertAxial(e)._2 + FaceVertAxial((e + 1) % 3)._2) / 2
        val (mfa, mfb) = descend0Axial(m0a, m0b, r)
        val (ra, rb) = rotC(mfa, mfb, EdgeRot(f)(e)(r))
        val ga = ra + EdgeTA(f)(e)(r)
        val gb = rb + EdgeTB(f)(e)(r)
        val (laF, loF) = hex2dToGeo(f, mfa.toDouble - 0.5 * mfb,
          mfb * Sin60, r)
        val (laG, loG) = hex2dToGeo(g, ga.toDouble - 0.5 * gb,
          gb * Sin60, r)
        val d = cos(laF) * cos(loF) * cos(laG) * cos(loG) +
          cos(laF) * sin(loF) * cos(laG) * sin(loG) + sin(laF) * sin(laG)
        // tolerance: the published face constants carry ~1e-9 residual
        // (deriveTables' own clustering band), which the two gnomonic
        // round trips amplify to ~1e-8; 1e-7 rad is still orders below
        // the finest pitch checked here (res 5 ≈ 2e-3 rad)
        require(acos(max(-1.0, min(1.0, d))) < 1e-7,
          s"face $f edge $e res $r: mapped edge midpoint diverges")
      }
    }
  }

  deriveFaceNeighbors()

  /** Translate a chart-local res-`res` axial coordinate lying outside
    * `face`'s triangular region onto the chart that owns it (H3's
    * `_adjustOverage`, derived). Crosses the most-violated edge first
    * and iterates (corner zones cross two edges); coordinates already
    * in-region (boundary inclusive) are returned unchanged. Packed
    * return (face << 50 | (a+2^24) << 25 | (b+2^24)) keeps the hot
    * traversal loop allocation-free; res ≤ 15 coords fit 30 bits. */
  private def overageNormalize(face0: Int, a0: Long, b0: Long,
      res: Int): Long = {
    var f = face0; var a = a0; var b = b0
    val w = TriW(res)
    var hop = 0
    var moved = true
    while (hop < 4 && moved) {
      moved = false
      var worst = -1; var worstMag = 0L
      var i = 0
      while (i < 3) {
        val wi = w(i); val wj = w((i + 1) % 3)
        val ea = wj._1 - wi._1; val eb = wj._2 - wi._2
        val cross = ea * (b - wi._2) - (a - wi._1) * eb
        val crossO = ea * (0L - wi._2) - (0L - wi._1) * eb
        // outside edge i iff cross is strictly on the opposite side of
        // the origin's sign; |cross| ∝ distance (equal-length edges)
        val viol = if (crossO > 0) -cross else cross
        if (viol > 0 && viol > worstMag) { worstMag = viol; worst = i }
        i += 1
      }
      if (worst >= 0) {
        val c = EdgeRot(f)(worst)(res)
        var xa = a; var xb = b
        var k = 0
        while (k < c) { val t = xa - xb; xb = xa; xa = t; k += 1 }
        a = xa + EdgeTA(f)(worst)(res)
        b = xb + EdgeTB(f)(worst)(res)
        f = EdgeFace(f)(worst)
        moved = true
      }
      hop += 1
    }
    (f.toLong << 50) | ((a + 16777216L) << 25) | (b + 16777216L)
  }

  // ------------------------------------------------------------------
  // Public API
  // ------------------------------------------------------------------
  /** Cell pitch scale per res, radians (≈4 face-center pitches) —
    * retained for the inverse's surrounded-center probe radius. */
  private val BandByRes: Array[Double] =
    Array.tabulate(MaxRes + 1)(r => 4.0 * atan(Res0UGnomonic) /
      math.pow(Sqrt7, r))

  /** (lat°, lng°, res) → H3 index (64-bit) — the h3lib `_geoToH3`
    * shape, made purely lattice-combinatorial (round 12): project
    * through the NEAREST face's gnomonic chart, round to the res-N
    * lattice, and assemble the index in the chart that OWNS the
    * rounded coordinate. Rounding can land up to half a pitch outside
    * the nearest face's triangular region (the boundary sliver); such
    * coordinates are first carried across the shared edge by the
    * derived face-neighbor isometry ([[overageNormalize]]) — where
    * the two charts' lattices have drifted apart by far less than
    * half a pitch, so the label transfer is exact. Identity is then
    * combinatorial: a cell's region is exactly the set of points
    * whose rounding normalizes to its coordinate in its owning chart,
    * so regions are connected, flanking charts cannot disagree about
    * a cell, and ghost ids (digit strings assembled through a chart
    * evaluated deep past its own face — the round-11 consensus
    * scheme's residual failure mode at coarse res, where it
    * fragmented regions and emitted non-invertible ids) cannot be
    * produced at all. Also strictly faster: one chart projection per
    * point instead of up to 20 consensus trials near boundaries. */
  /** Gnomonic projection + exact 4-corner lattice rounding through
    * `face`'s chart (the geometric half of rawIndexOnFace); result
    * packed as [[hex2dToAxialPacked]]. */
  @inline private def projectRound(latR: Double, lngR: Double, res: Int,
      face: Int): Long = {
    val cosLat = cos(latR)
    val dot = max(-1.0, min(1.0,
      cosLat * cos(lngR) * FaceX(face) +
        cosLat * sin(lngR) * FaceY(face) + sin(latR) * FaceZ(face)))
    val rAng = acos(dot)
    var x = 0.0; var y = 0.0
    if (rAng >= 1e-15) {
      val az = geoAzimuth(FaceLat(face), FaceLng(face), latR, lngR)
      var theta = posAngle(FaceAz0(face) - posAngle(az))
      if ((res & 1) == 1) theta = posAngle(theta - Ap7Rot) // Class III
      var rr = tan(rAng) / Res0UGnomonic
      var n = 0
      while (n < res) { rr *= Sqrt7; n += 1 }
      x = rr * cos(theta); y = rr * sin(theta)
    }
    hex2dToAxialPacked(x, y)
  }

  def latLngToCell(latDeg: Double, lngDeg: Double, res: Int): Long = {
    require(res >= 0 && res <= MaxRes, s"resolution $res out of [0,15]")
    val latR = toRadians(latDeg); val lngR = toRadians(lngDeg)
    val face = nearestFace(latR, lngR)
    val packed = projectRound(latR, lngR, res, face)
    val a = (packed >>> 32) - 1073741824L
    val b = (packed & 0xFFFFFFFFL) - 1073741824L
    val pk = overageNormalize(face, a, b, res)
    val h = assembleFromChart((pk >>> 50).toInt,
      ((pk >> 25) & 0x1FFFFFFL) - 16777216L,
      (pk & 0x1FFFFFFL) - 16777216L, 0L, res)
    require(h >= 0, s"unresolvable coordinate ($latDeg, $lngDeg) res $res")
    h
  }

  @inline private def finishRaw(o: RawOut): Long = {
    val idx = tabIdx(o.face, o.i, o.j, o.k)
    val bc = TabBc(idx)
    require(bc >= 0, s"unmapped base-cell coord (${o.face},${o.i},${o.j},${o.k})")
    val rot = TabRot(idx)
    require(rot >= 0,
      s"unresolved pentagon appearance (${o.face},${o.i},${o.j},${o.k}) for cell $bc")
    finishWith(o.h, bc, rot, PentCwOffset(bc * 32 + o.face))
  }

  /** (lat°, lng°, res) → canonical lowercase 15-hex-digit cell id. */
  def latLngToCellString(latDeg: Double, lngDeg: Double, res: Int): String =
    java.lang.Long.toHexString(latLngToCell(latDeg, lngDeg, res))

  def isPentagonCell(h: Long): Boolean = IsPent(getBaseCell(h))

  /** Pentagon cell centers (icosahedron vertices), degrees — exposed
    * for tests and for callers that need to locate/avoid pentagons. */
  def pentagonCenters: IndexedSeq[(Int, Double, Double)] =
    (0 until NumBaseCells).filter(IsPent).map { bc =>
      (bc, toDegrees(PentLat(bc)), toDegrees(PentLng(bc)))
    }

  // ------------------------------------------------------------------
  // Inverse: cell → center (cellToLatLng)
  // ------------------------------------------------------------------
  /** Inverse unprojection at any res: (face, hex2d, res) → geo radians.
    * Exact inverse of [[geoToHex2d]]: undo the aperture-7 scaling
    * (÷√7 per res step) and the Class III grid rotation (+[[Ap7Rot]]
    * at odd res), then invert the gnomonic projection along the
    * azimuth from the face center. */
  private def hex2dToGeo(face: Int, x: Double, y: Double,
      res: Int): (Double, Double) = {
    var rr = sqrt(x * x + y * y)
    if (rr < 1e-15) return (FaceLat(face), FaceLng(face))
    var theta = atan2(y, x)
    if ((res & 1) == 1) theta = posAngle(theta + Ap7Rot) // undo Class III
    var n = 0
    while (n < res) { rr /= Sqrt7; n += 1 }
    val dist = atan(rr * Res0UGnomonic)
    val az = posAngle(FaceAz0(face) - theta)
    geoAzDistance(FaceLat(face), FaceLng(face), az, dist)
  }

  /** Appearances of each base cell across face charts:
    * (face, i, j, k, ccwRot60) per table slot — the inverse tries each
    * chart and keeps the one the forward path proves right. Built after
    * [[resolvePentagons]] so pentagon rotations are resolved. */
  private val BcApps: Array[Array[(Int, Long, Long, Long, Int)]] = {
    val by = Array.fill(NumBaseCells)(
      List.empty[(Int, Long, Long, Long, Int)])
    for (f <- 19 to 0 by -1; i <- 2 to 0 by -1; j <- 2 to 0 by -1;
         k <- 2 to 0 by -1) {
      val idx = tabIdx(f, i, j, k)
      if (TabBc(idx) >= 0)
        by(TabBc(idx)) ::= ((f, i.toLong, j.toLong, k.toLong, TabRot(idx)))
    }
    // canonical-orientation (rot 0) appearances first: the home chart
    // resolves the bulk of cells on the first try
    by.map(_.sortBy { case (f, _, _, _, rot) =>
      (if (rot == 0) 0 else 1, f)
    }.toArray)
  }

  /** Descend a res-0 ijk down `res` aperture-7 steps, applying the raw
    * (chart-local) digits of `h` — the exact inverse of the digit
    * up-aggregation loop in [[rawIndexInto]]: at each step the parent
    * is down-scaled into the child grid (Class III ccw at odd res,
    * Class II cw at even) and the unit digit vector added. */
  private def descendDigits(i0: Long, j0: Long, k0: Long, h: Long,
      res: Int): (Long, Long, Long) = {
    var i = i0; var j = j0; var k = k0
    var r = 1
    while (r <= res) {
      var ci = 0L; var cj = 0L; var ck = 0L
      if ((r & 1) == 1) { ci = 3 * i + j; cj = 3 * j + k; ck = i + 3 * k }
      else { ci = 3 * i + k; cj = i + 3 * j; ck = j + 3 * k }
      val d = getDigit(h, r)
      ci += (d >> 2) & 1; cj += (d >> 1) & 1; ck += d & 1
      val m = min(ci, min(cj, ck))
      i = ci - m; j = cj - m; k = ck - m
      r += 1
    }
    (i, j, k)
  }

  /** Exact inverse of `rot` ccw pentagon rotations: walk the orbit of
    * `h` under [[rotatePent60ccw]] (order ≤ 6 — 5 on generic digit
    * strings, smaller on rotation-symmetric ones) and pick the element
    * that `rot` forward applications map back onto `h`. */
  private def unrotatePent(h: Long, rot: Int): Long = {
    if (rot == 0) return h
    var orbit = List(h)
    var x = h
    var ord = 0
    var n = 1
    while (ord == 0 && n <= 6) {
      x = rotatePent60ccw(x)
      if (x == h) ord = n else orbit ::= x
      n += 1
    }
    require(ord > 0, s"pentagon rotation orbit of $h does not close")
    // orbit(i) = element after (ord-1-i) forward applications; the
    // pre-image under `rot` applications is the element reached by
    // steps = (ord - rot mod ord) forward applications
    val steps = (ord - rot % ord) % ord
    if (steps == 0) h else orbit(ord - 1 - steps)
  }

  /** H3 cell → exact center (lat°, lng°) — the inverse of
    * [[latLngToCell]], the API the reference's enrichment slot lacks
    * but any geo pipeline needs to materialize cell geometry
    * (cell→point joins, centroid exports, reverse geocoding).
    *
    * Method (round 12, fully combinatorial — the exact inverse of the
    * overage-normalized forward): for each appearance (face chart) of
    * the cell's base cell, exactly invert the forward finishing —
    * un-rotate the canonical digits (pentagons via the rotation-orbit
    * inverse and the two validity-gated leading-K escape pre-images),
    * descend the chart's res-0 ijk through the raw digits — then
    * OVERAGE-NORMALIZE the descended coordinate onto the chart that
    * owns it ([[overageNormalize]]; a res-N descendant can lie
    * physically outside its home chart's face region) and accept the
    * candidate iff re-assembling the normalized coordinate in its
    * owning chart yields `h` bit-for-bit. That acceptance is exact —
    * no geometric tolerance: assembly is injective per chart, so the
    * normalized coordinate IS the cell's canonical coordinate, and
    * the returned center is its unprojection through the owning
    * chart, which the forward maps back to `h` by construction.
    * Throws on malformed input (bad mode/base-cell/digit fields,
    * pentagon deleted-axis subsequences): such indexes have no
    * appearance that verifies. */
  def cellToLatLng(h: Long): (Double, Double) = {
    val (_, _, _, _, latD, lngD) = resolveChart(h)
    (latD, lngD)
  }

  /** The canonical chart behind [[cellToLatLng]], exposed for the grid
    * traversal: (face, i, j, k, lat°, lng°) where (face, ijk) is the
    * OVERAGE-NORMALIZED chart-local res-N lattice coordinate (in-region
    * on `face`, re-assembling to `h`), and (lat°, lng°) its exact
    * unprojected center. */
  private def resolveChart(h: Long): (Int, Long, Long, Long, Double, Double) = {
    val res = getResolution(h)
    val bc = getBaseCell(h)
    require((h >>> 59) == 1L, s"not a cell-mode H3 index: $h")
    require(bc < NumBaseCells, s"invalid base cell $bc")
    var r = 1
    while (r <= res) {
      require(getDigit(h, r) != 7, s"invalid digit 7 at res $r in $h")
      r += 1
    }
    while (r <= MaxRes) {
      require(getDigit(h, r) == 7, s"unused digit not 7 at res $r in $h")
      r += 1
    }
    val pent = IsPent(bc)
    val apps = BcApps(bc)
    var a = 0
    while (a < apps.length) {
      val (f, i0, j0, k0, rot) = apps(a)
      if (rot >= 0) {
        // exact un-rotation back to this chart's raw orientation
        val u =
          if (pent) unrotatePent(h, rot)
          else {
            var x = h; var n = 0
            while (n < rot) { x = rotate60(x, CwDigit); n += 1 }
            x
          }
        // leading-K escape pre-images (pentagons only): the forward
        // escape fired iff the raw led with K, so each pre-image is
        // gated on the leading digit it implies
        var c = 0
        val nCands = if (pent) 2 else 1
        while (c < nCands) {
          var raw = 0L
          var valid = false
          if (c == 0) { raw = u; valid = !pent || leadingNonZeroDigit(u) != 1 }
          else {
            val t = if (PentCwOffset(bc * 32 + f)) CcwDigit else CwDigit
            raw = rotate60(u, t)
            valid = leadingNonZeroDigit(raw) == 1
          }
          if (valid) {
            val (ri, rj, rk) = descendDigits(i0, j0, k0, raw, res)
            // carry the descended coordinate onto its owning chart and
            // accept iff it re-assembles to h — combinatorially exact
            // (assembly is injective per chart), replacing the round-11
            // co-nearest/surrounded-probe heuristics
            val pk = overageNormalize(f, ri - rk, rj - rk, res)
            val nf = (pk >>> 50).toInt
            val na = ((pk >> 25) & 0x1FFFFFFL) - 16777216L
            val nb = (pk & 0x1FFFFFFL) - 16777216L
            if (assembleFromChart(nf, na, nb, 0L, res) == h) {
              val (latR, lngR) = hex2dToGeo(nf,
                na.toDouble - 0.5 * nb, nb * Sin60, res)
              val m = min(na, min(nb, 0L))
              return (nf, na - m, nb - m, -m,
                toDegrees(latR), toDegrees(lngR))
            }
          }
          c += 1
        }
      }
      a += 1
    }
    throw new IllegalArgumentException(
      f"invalid or non-invertible H3 index 0x$h%x (base cell $bc)")
  }

  /** Hex-string form of [[cellToLatLng]] (the engine's cell columns are
    * canonical lowercase hex strings). */
  def cellToLatLng(hex: String): (Double, Double) =
    cellToLatLng(java.lang.Long.parseUnsignedLong(hex, 16))

  /** Scalar forms for codegen call sites (each a full inversion — the
    * inverse is a cold-path API, not a per-row hot loop over TBs). */
  def cellCenterLat(hex: String): Double = cellToLatLng(hex)._1
  def cellCenterLng(hex: String): Double = cellToLatLng(hex)._2

  // ------------------------------------------------------------------
  // Grid traversal: ring-1 neighbors and k-disks (gridDisk)
  // ------------------------------------------------------------------
  /** Grid traversal internals. Since round 12 the primary path is
    * [[ringCanonical]] — pure integer stepping in the owning chart
    * with overage normalization across the derived face-neighbor
    * isometries, exact by the spec-pinned cross-chart consistency law
    * (`countHexIsoMismatches == 0`). The geometric multi-appearance
    * path below ([[ringInteger]] + the symmetry closure in
    * [[gridRing1]]) is retained as the fallback for the cases the
    * canonical path declines: pentagon cells (whose 5-sector digit
    * quotient the hexagonal isometry does not cover) and any anchor
    * that fails its canonical re-assembly check. */
  /** Assemble the canonical cell id owning chart-local lattice
    * coordinate (i, j, k) at `res` on `face` — PURE INTEGER aperture-7
    * aggregation through the canonical tables (the geometric half of
    * [[rawIndexOnFace]] removed). Returns -1 when the res-0
    * aggregation falls outside the face's 27-slot coverage (caller
    * tries another appearance). */
  private def assembleFromChart(face: Int, li: Long, lj: Long, lk: Long,
      res: Int): Long = {
    var i = li; var j = lj; var k = lk
    var m = min(i, min(j, k)); i -= m; j -= m; k -= m
    var h = (1L << 59) | (res.toLong << 52) | ((1L << 45) - 1)
    var r = res
    while (r > 0) {
      val ci0 = i; val cj0 = j; val ck0 = k
      val ai = (i - k).toDouble
      val aj = (j - k).toDouble
      var ui = 0L; var uj = 0L
      if ((r & 1) == 1) { // Class III (ccw)
        ui = floor((3.0 * ai - aj) / 7.0 + 0.5).toLong
        uj = floor((ai + 2.0 * aj) / 7.0 + 0.5).toLong
      } else { // Class II (cw)
        ui = floor((2.0 * ai + aj) / 7.0 + 0.5).toLong
        uj = floor((3.0 * aj - ai) / 7.0 + 0.5).toLong
      }
      var uk = 0L
      m = min(ui, min(uj, uk)); ui -= m; uj -= m; uk -= m
      var ci = 0L; var cj = 0L; var ck = 0L
      if ((r & 1) == 1) { ci = 3 * ui + uj; cj = 3 * uj + uk; ck = ui + 3 * uk }
      else { ci = 3 * ui + uk; cj = ui + 3 * uj; ck = uj + 3 * uk }
      m = min(ci, min(cj, ck)); ci -= m; cj -= m; ck -= m
      var di = ci0 - ci; var dj = cj0 - cj; var dk = ck0 - ck
      m = min(di, min(dj, dk)); di -= m; dj -= m; dk -= m
      if (((di | dj | dk) & ~1L) != 0L) return -1L
      h = setDigit(h, r, (4 * di + 2 * dj + dk).toInt)
      i = ui; j = uj; k = uk
      r -= 1
    }
    if (i < 0 || i > 2 || j < 0 || j > 2 || k < 0 || k > 2) return -1L
    val idx = tabIdx(face, i, j, k)
    val bc = TabBc(idx)
    if (bc < 0) return -1L
    val rot = TabRot(idx)
    if (rot < 0) return -1L
    finishWith(h, bc, rot, PentCwOffset(bc * 32 + face))
  }

  /** The integer-verified neighbor pass of [[gridRing1]]: candidates
    * assembled in lattice space and kept only when the stepped
    * coordinate's unprojection coincides with the assembled cell's
    * true center. Complete for all-interior neighborhoods; a face
    * crossing the derived tables cannot stitch leaves a direction
    * empty (the symmetry closure in [[gridRing1]] fills it). */
  private def ringInteger(h: Long): Array[Long] = {
    val res = getResolution(h)
    // validates the index (throws on malformed input) and yields the
    // exact center for the geometric verification below
    val (fCanon, cI, cJ, cK, hLatD, hLngD) = resolveChart(h)
    val hLatR = toRadians(hLatD); val hLngR = toRadians(hLngD)
    val hx = cos(hLatR) * cos(hLngR)
    val hy = cos(hLatR) * sin(hLngR)
    val hz = sin(hLatR)
    val bc = getBaseCell(h)
    val pent = IsPent(bc)
    val out = new Array[Long](12)
    var n = 0
    def add(c: Long): Unit = if (c >= 0 && c != h) {
      var seen = false
      var s = 0
      while (s < n) { if (out(s) == c) seen = true; s += 1 }
      if (!seen) { out(n) = c; n += 1 }
    }
    @inline def ang(aLatR: Double, aLngR: Double,
        bLatR: Double, bLngR: Double): Double = {
      val d = cos(aLatR) * cos(aLngR) * cos(bLatR) * cos(bLngR) +
        cos(aLatR) * sin(aLngR) * cos(bLatR) * sin(bLngR) +
        sin(aLatR) * sin(bLatR)
      acos(max(-1.0, min(1.0, d)))
    }
    // For every appearance of the base cell: recover h's chart-local
    // lattice coordinate (the integer identity assemble-then-descend
    // sanity-checks the bookkeeping and selects the valid pentagon
    // leading-K pre-image), assemble the six unit-step coordinates
    // back to canonical ids through the same tables, then VERIFY each
    // candidate geometrically: the stepped coordinate's unprojection
    // must coincide with the assembled cell's true center. The integer
    // identity alone is vacuous off-face (a digit string descended
    // through the wrong anchor still round-trips), and a chart
    // evaluated deep past its face assembles lattice-wrong GHOST ids
    // whose true centers sit several pitches away - the 0.4-pitch
    // gate (true neighbors measure 0 on-face and at most ~0.3 pitch
    // for a one-cell face crossing) separates the two regimes
    // decisively. The same gate applied to the appearance's own
    // coordinate of h keeps mis-anchored appearances from stepping at
    // all.
    val apps = BcApps(bc)
    var a = 0
    while (a < apps.length) {
      val (f, i0, j0, k0, rot) = apps(a)
      if (rot >= 0) {
        val u =
          if (pent) unrotatePent(h, rot)
          else {
            var x = h; var m = 0
            while (m < rot) { x = rotate60(x, CwDigit); m += 1 }
            x
          }
        var c = 0
        val nCands = if (pent) 2 else 1
        while (c < nCands) {
          var raw = 0L
          var valid = false
          if (c == 0) { raw = u; valid = !pent || leadingNonZeroDigit(u) != 1 }
          else {
            val t = if (PentCwOffset(bc * 32 + f)) CcwDigit else CwDigit
            raw = rotate60(u, t)
            valid = leadingNonZeroDigit(raw) == 1
          }
          if (valid) {
            val (ri, rj, rk) = descendDigits(i0, j0, k0, raw, res)
            if (assembleFromChart(f, ri, rj, rk, res) == h) {
              val (ax, ay) = ijkToHex2d(ri, rj, rk)
              val (aLatR, aLngR) = hex2dToGeo(f, ax, ay, res)
              val anchorDist = ang(aLatR, aLngR, hLatR, hLngR)
              var d = 1
              while (d <= 6) {
                val si = ri + ((d >> 2) & 1)
                val sj = rj + ((d >> 1) & 1)
                val sk = rk + (d & 1)
                val (sx, sy) = ijkToHex2d(si, sj, sk)
                val (sLatR, sLngR) = hex2dToGeo(f, sx, sy, res)
                val localPitch = ang(sLatR, sLngR, aLatR, aLngR)
                if (anchorDist <= 0.25 * localPitch) {
                  // geometric acceptance gate shared by both routes,
                  // against the INDEPENDENT reference (the stepped
                  // coordinate's unprojection through h's own verified
                  // chart — accurate to the one-cell chart drift,
                  // ≤ ~0.3 pitch): a candidate's true center must
                  // coincide with it (ghosts measure several pitches
                  // off); a deep ghost can even be NON-INVERTIBLE —
                  // that too is a reject. The overage candidate is NOT
                  // checked against its own chart's unprojection: that
                  // would be circular (any assembled id trivially sits
                  // at its own coordinate's unprojection).
                  @inline def verifyAdd(nb: Long): Unit =
                    if (nb >= 0 && nb != h) {
                      try {
                        val (nLatD, nLngD) = cellToLatLng(nb)
                        if (ang(sLatR, sLngR, toRadians(nLatD),
                            toRadians(nLngD)) <= 0.4 * localPitch)
                          add(nb)
                      } catch {
                        case _: IllegalArgumentException => ()
                      }
                    }
                  verifyAdd(assembleFromChart(f, si, sj, sk, res))
                  // overage route (round 12): when the stepped
                  // coordinate leaves this face's region, re-anchor it
                  // through the derived face-neighbor isometry and
                  // assemble in the chart that OWNS the region — the
                  // chart whose assembly matches the forward identity
                  // there. Closes the contested-zone directions the
                  // home-chart continuation assembles as ghosts.
                  val pk = overageNormalize(f, si - sk, sj - sk, res)
                  val nf = (pk >>> 50).toInt
                  if (nf != f) {
                    val na = ((pk >> 25) & 0x1FFFFFFL) - 16777216L
                    val nbAx = (pk & 0x1FFFFFFL) - 16777216L
                    verifyAdd(assembleFromChart(nf, na, nbAx, 0L, res))
                  }
                }
                d += 1
              }
            }
          }
          c += 1
        }
      }
      a += 1
    }
    java.util.Arrays.sort(out, 0, n) // res <= 15 indexes have bit 63 = 0
    java.util.Arrays.copyOf(out, n)
  }

  /** Canonical integer ring (round 12): anchor `h` at its
    * overage-normalized coordinate in its OWNING chart, take the six
    * unit lattice steps, normalize each stepped coordinate across the
    * face-neighbor isometries, and assemble it in ITS owning chart.
    * With forward identity defined the same way ([[latLngToCell]]),
    * each step is exact adjacency by construction — no geometric
    * tolerance anywhere. Returns null when the canonical anchor does
    * not re-assemble to `h` (caller falls back to the geometric
    * multi-appearance path); a pentagon's six steps must dedupe to
    * its five true neighbors or the caller likewise falls back. */
  private def ringCanonical(h: Long): Array[Long] = {
    val res = getResolution(h)
    val (f, ci, cj, ck, _, _) = resolveChart(h) // validates h; throws on bad input
    val pk0 = overageNormalize(f, ci - ck, cj - ck, res)
    val f0 = (pk0 >>> 50).toInt
    val a0 = ((pk0 >> 25) & 0x1FFFFFFL) - 16777216L
    val b0 = (pk0 & 0x1FFFFFFL) - 16777216L
    if (assembleFromChart(f0, a0, b0, 0L, res) != h) return null
    val out = new Array[Long](6)
    var n = 0
    var d = 1
    while (d <= 6) {
      // unit digit d in axial form: (di - dk, dj - dk)
      val sa = a0 + ((d >> 2) & 1) - (d & 1)
      val sb = b0 + ((d >> 1) & 1) - (d & 1)
      val pk = overageNormalize(f0, sa, sb, res)
      val c = assembleFromChart((pk >>> 50).toInt,
        ((pk >> 25) & 0x1FFFFFFL) - 16777216L,
        (pk & 0x1FFFFFFL) - 16777216L, 0L, res)
      if (c >= 0 && c != h) {
        var seen = false
        var s = 0
        while (s < n) { if (out(s) == c) seen = true; s += 1 }
        if (!seen) { out(n) = c; n += 1 }
      }
      d += 1
    }
    java.util.Arrays.sort(out, 0, n)
    java.util.Arrays.copyOf(out, n)
  }

  def gridRing1(h: Long): Array[Long] = {
    val expected = if (isPentagon(h)) 5 else 6
    val fast = ringCanonical(h)
    if (fast != null && fast.length == expected) return fast
    val base = ringInteger(h)
    if (base.length >= expected) return base
    // Symmetry closure: a face crossing the derived tables cannot
    // stitch from h's side can still be proven from the OTHER side —
    // the missing neighbor is adjacent to two already-found ring
    // members, so it appears in their integer rings, and its own
    // integer ring containing h is a full verified adjacency witness.
    var out = base
    var i = 0
    while (i < base.length && out.length < expected) {
      val around = ringInteger(base(i))
      var j = 0
      while (j < around.length && out.length < expected) {
        val cand = around(j)
        if (cand != h && !out.contains(cand) &&
            ringInteger(cand).contains(h))
          out = out :+ cand
        j += 1
      }
      i += 1
    }
    java.util.Arrays.sort(out)
    out
  }

  /** Is `h` itself a pentagon cell (5 neighbors)? Distinct from
    * [[isPentagonCell]], which is base-cell MEMBERSHIP: a nonzero-digit
    * cell inside a pentagon base cell is an ordinary hexagon. */
  def isPentagon(h: Long): Boolean =
    IsPent(getBaseCell(h)) && leadingNonZeroDigit(h) == 0

  /** All cells within grid distance `k` of `h`, INCLUDING `h` itself
    * (H3 `gridDisk` semantics), sorted. BFS over [[gridRing1]]: each
    * step is an exact adjacency, so BFS depth is true grid distance
    * and the disk is exact near pentagons too (where ring sizes
    * shrink and the hexagon count formula 1+3k(k+1) over-counts). */
  def gridDisk(h: Long, k: Int): Array[Long] = {
    require(k >= 0, s"gridDisk k must be >= 0, got $k")
    var seen = Set(h)
    var frontier = List(h)
    var step = 0
    while (step < k && frontier.nonEmpty) {
      var next = List.empty[Long]
      frontier.foreach { c =>
        gridRing1(c).foreach { nb =>
          if (!seen(nb)) { seen += nb; next ::= nb }
        }
      }
      frontier = next
      step += 1
    }
    val arr = seen.toArray
    java.util.Arrays.sort(arr)
    arr
  }

  /** Hex-string forms (the engine's cell columns are canonical
    * lowercase hex strings). */
  def gridDiskHex(hex: String, k: Int): Array[String] =
    gridDisk(java.lang.Long.parseUnsignedLong(hex, 16), k)
      .map(c => f"$c%x")

  /** Off-edge isometry probe for [[graft.functions.H3IsoDbg]]: sample
    * points just INSIDE the neighbor face across edge `e` of face `f`,
    * compare the neighbor chart's direct lattice rounding with the
    * isometry image of the home chart's rounding. Returns
    * (neighborFace, (samples, mismatches, first few axial offsets)). */
  private[functions] def probeEdgeIso(f: Int, e: Int,
      res: Int): (Int, (Int, Int, List[(Long, Long)])) = {
    val g = EdgeFace(f)(e)
    val (a1, b1) = FaceVertAxial(e)
    val (a2, b2) = FaceVertAxial((e + 1) % 3)
    val (vla1, vlo1) = hex2dToGeoRes0(f, a1.toDouble - 0.5 * b1, b1 * Sin60)
    val (vla2, vlo2) = hex2dToGeoRes0(f, a2.toDouble - 0.5 * b2, b2 * Sin60)
    val v1 = Array(cos(vla1) * cos(vlo1), cos(vla1) * sin(vlo1), sin(vla1))
    val v2 = Array(cos(vla2) * cos(vlo2), cos(vla2) * sin(vlo2), sin(vla2))
    val gC = Array(FaceX(g), FaceY(g), FaceZ(g))
    val pitch = atan(Res0UGnomonic) / math.pow(Sqrt7, res)
    var total = 0
    var mis = 0
    var offs = List.empty[(Long, Long)]
    for (tI <- 1 to 19; dI <- 1 to 3) {
      val t = tI / 20.0
      // point on the edge chord, pushed toward G's center by dI·0.4
      // pitch, renormalized to the sphere
      val push = dI * 0.4 * pitch
      val ex = v1(0) * (1 - t) + v2(0) * t
      val ey = v1(1) * (1 - t) + v2(1) * t
      val ez = v1(2) * (1 - t) + v2(2) * t
      val en = sqrt(ex * ex + ey * ey + ez * ez)
      var px = ex / en; var py = ey / en; var pz = ez / en
      // tangential direction toward G's center
      val dotG = px * gC(0) + py * gC(1) + pz * gC(2)
      var tx = gC(0) - dotG * px; var ty = gC(1) - dotG * py
      var tz = gC(2) - dotG * pz
      val tn = sqrt(tx * tx + ty * ty + tz * tz)
      tx /= tn; ty /= tn; tz /= tn
      px += tx * push; py += ty * push; pz += tz * push
      val pn = sqrt(px * px + py * py + pz * pz)
      px /= pn; py /= pn; pz /= pn
      val latR = asin(max(-1.0, min(1.0, pz)))
      val lngR = atan2(py, px)
      // direct: neighbor-chart rounding
      val pg = projectRound(latR, lngR, res, g)
      val ga = (pg >>> 32) - 1073741824L
      val gb = (pg & 0xFFFFFFFFL) - 1073741824L
      // home-chart rounding + isometry
      val pf = projectRound(latR, lngR, res, f)
      val fa = (pf >>> 32) - 1073741824L
      val fb = (pf & 0xFFFFFFFFL) - 1073741824L
      val c = EdgeRot(f)(e)(res)
      var xa = fa; var xb = fb
      var k = 0
      while (k < c) { val tt = xa - xb; xb = xa; xa = tt; k += 1 }
      xa += EdgeTA(f)(e)(res)
      xb += EdgeTB(f)(e)(res)
      total += 1
      if (xa != ga || xb != gb) {
        mis += 1
        if (offs.size < 5) offs ::= ((xa - ga, xb - gb))
      }
    }
    (g, (total, mis, offs))
  }

  /** Count of HEXAGON cross-chart assembly disagreements at `res` —
    * the spec-pinned round-12 consistency invariant (must be 0; see
    * `H3Spec`). Pentagon-base-cell ids are excluded: their digit
    * strings live in the 5-sector quotient where the plain hexagonal
    * isometry does not apply across the deleted axis. */
  private[functions] def countHexIsoMismatches(res: Int): Int = {
    var mis = 0
    val lim = TriW(res).map(w => max(abs(w._1), abs(w._2))).max + 4
    for (f <- 0 until 20; e <- 0 until 3) {
      val g = EdgeFace(f)(e)
      val c = EdgeRot(f)(e)(res)
      var a = -lim
      while (a <= lim) {
        var b = -lim
        while (b <= lim) {
          val hF = assembleFromChart(f, a, b, 0L, res)
          if (hF >= 0 && !IsPent(getBaseCell(hF))) {
            var xa = a; var xb = b
            var n = 0
            while (n < c) { val t = xa - xb; xb = xa; xa = t; n += 1 }
            xa += EdgeTA(f)(e)(res)
            xb += EdgeTB(f)(e)(res)
            val hG = assembleFromChart(g, xa, xb, 0L, res)
            if (hG >= 0 && !IsPent(getBaseCell(hG)) && hF != hG) mis += 1
          }
          b += 1
        }
        a += 1
      }
    }
    mis
  }

  /** Pentagon-quotient consistency stats (round 12, the deleted-axis
    * analogue of [[countHexIsoMismatches]]): for every face edge and
    * every coordinate X where BOTH charts assemble into the SAME
    * pentagon base cell, the two canonical labels must lie in one
    * order-5 pentagon-rotation orbit, and the orbit step must be the
    * same for every such coordinate of that (face, edge, baseCell) —
    * the hexagonal edge isometry is off by exactly the vertex's
    * curvature defect inside the pentagon's 5-sector quotient, a
    * CONSTANT per unfolding, never a coordinate-dependent scramble.
    * Returns (pairsChecked, outOfOrbitCount, stepsPerEdgePentagon).
    * The spec pins: zero out-of-orbit, singleton step sets, steps in
    * {0, 1, 4} (identity or ±1 sector). */
  private[functions] def pentIsoOrbitStats(res: Int)
      : (Int, Int, Map[(Int, Int, Int), Set[Int]]) = {
    var pairs = 0
    var outOfOrbit = 0
    val steps = scala.collection.mutable.Map
      .empty[(Int, Int, Int), Set[Int]]
    val lim = TriW(res).map(w => max(abs(w._1), abs(w._2))).max + 4
    for (f <- 0 until 20; e <- 0 until 3) {
      val g = EdgeFace(f)(e)
      val c = EdgeRot(f)(e)(res)
      var a = -lim
      while (a <= lim) {
        var b = -lim
        while (b <= lim) {
          val hF = assembleFromChart(f, a, b, 0L, res)
          if (hF >= 0 && IsPent(getBaseCell(hF))) {
            var xa = a; var xb = b
            var n = 0
            while (n < c) { val t = xa - xb; xb = xa; xa = t; n += 1 }
            xa += EdgeTA(f)(e)(res)
            xb += EdgeTB(f)(e)(res)
            val hG = assembleFromChart(g, xa, xb, 0L, res)
            if (hG >= 0 && getBaseCell(hG) == getBaseCell(hF)) {
              pairs += 1
              var k = 0
              var cur = hF
              var found = -1
              while (k < 5) {
                if (cur == hG && found < 0) found = k
                cur = rotatePent60ccw(cur)
                k += 1
              }
              if (found < 0) outOfOrbit += 1
              else {
                val key = (f, e, getBaseCell(hF))
                steps(key) = steps.getOrElse(key, Set.empty) + found
              }
            }
          }
          b += 1
        }
        a += 1
      }
    }
    (pairs, outOfOrbit, steps.toMap)
  }

  /** Coordinate-level label-consistency probe: for every edge and a
    * dense coordinate patch, compare assembleF(X) with
    * assembleG(iso_r(X)) wherever both are defined. */
  private[functions] def probeCoordConsistency(res: Int): Unit = {
    var both = 0
    var mis = 0
    val ex = scala.collection.mutable.ArrayBuffer.empty[String]
    val lim = TriW(res).map(w => max(abs(w._1), abs(w._2))).max + 4
    for (f <- 0 until 20; e <- 0 until 3) {
      val g = EdgeFace(f)(e)
      val c = EdgeRot(f)(e)(res)
      var a = -lim
      while (a <= lim) {
        var b = -lim
        while (b <= lim) {
          val hF = assembleFromChart(f, a, b, 0L, res)
          if (hF >= 0) {
            var xa = a; var xb = b
            var n = 0
            while (n < c) { val t = xa - xb; xb = xa; xa = t; n += 1 }
            xa += EdgeTA(f)(e)(res)
            xb += EdgeTB(f)(e)(res)
            val hG = assembleFromChart(g, xa, xb, 0L, res)
            if (hG >= 0) {
              both += 1
              if (hF != hG) {
                mis += 1
                if (!IsPent(getBaseCell(hF)) && !IsPent(getBaseCell(hG)))
                  ex += f"HEX MISMATCH f=$f e=$e g=$g X=($a,$b) " +
                    f"iso=($xa,$xb) hF=0x$hF%x hG=0x$hG%x"
                else if (ex.size < 4)
                  ex += f"(pent) f=$f e=$e X=($a,$b) hF=0x$hF%x hG=0x$hG%x"
              }
            }
          }
          b += 1
        }
        a += 1
      }
    }
    println(s"res $res: $both coords defined both sides, $mis mismatches")
    ex.foreach(s => println("  " + s))
  }

  /** Table-consistency probe for [[graft.functions.H3TabDbg]]: for
    * each edge, map every res-0 slot through the res-0 isometry and
    * compare base cells and rotation deltas. */
  private[functions] def probeTableConsistency(): Unit = {
    var bcMis = 0
    var slots = 0
    // delta histogram keyed (c, rotF - rotG mod 6) for hexagon slots
    val hist = scala.collection.mutable.Map.empty[(Int, Int), Int]
    val mism = scala.collection.mutable.ArrayBuffer.empty[String]
    for (f <- 0 until 20; e <- 0 until 3) {
      val g = EdgeFace(f)(e)
      val c = EdgeRot(f)(e)(0)
      for (i <- 0 to 2; j <- 0 to 2; k <- 0 to 2
           if TabBc(tabIdx(f, i, j, k)) >= 0) {
        val a0 = i.toLong - k; val b0 = j.toLong - k
        var xa = a0; var xb = b0
        var n = 0
        while (n < c) { val t = xa - xb; xb = xa; xa = t; n += 1 }
        xa += EdgeTA(f)(e)(0)
        xb += EdgeTB(f)(e)(0)
        val m = min(xa, min(xb, 0L))
        val (gi, gj, gk) = (xa - m, xb - m, -m)
        if (gi <= 2 && gj <= 2 && gk <= 2 &&
            TabBc(tabIdx(g, gi, gj, gk)) >= 0) {
          slots += 1
          val bcF = TabBc(tabIdx(f, i, j, k))
          val bcG = TabBc(tabIdx(g, gi, gj, gk))
          if (bcF != bcG) {
            bcMis += 1
            if (mism.size < 20)
              mism += s"bc mismatch f=$f($i,$j,$k)=$bcF vs g=$g($gi,$gj,$gk)=$bcG"
          } else if (!IsPent(bcF)) {
            val rF = TabRot(tabIdx(f, i, j, k))
            val rG = TabRot(tabIdx(g, gi, gj, gk))
            val d = ((rF - rG) % 6 + 6) % 6
            hist((c, d)) = hist.getOrElse((c, d), 0) + 1
          }
        }
      }
    }
    println(s"slots mapped in-table: $slots, bc mismatches: $bcMis")
    mism.foreach(s => println("  " + s))
    println("rot delta histogram (edgeRotC, (rotF-rotG) mod 6) -> count:")
    hist.toSeq.sortBy(x => (x._1._1, x._1._2)).foreach { case ((c, d), n) =>
      println(f"  c=$c d=$d : $n")
    }
  }

  // ------------------------------------------------------------------
  // Hierarchy: parent / children / compact / uncompact (h3lib
  // `cellToParent` / `cellToChildren` / `compactCells` /
  // `uncompactCells`). Pure 64-bit digit arithmetic — no geometry: the
  // H3 index IS the hierarchy (parent = digit truncation), so these are
  // exact by construction. The pentagon rule is h3lib's: a cell with a
  // pentagon base cell may not carry a LEADING K digit (digit 1 before
  // any other nonzero digit) — the K subsequence is the deleted axis —
  // so a pentagon CELL (center digit path) has 6 children, not 7.
  // ------------------------------------------------------------------

  /** Field validation shared by the hierarchy API (h3lib
    * `isValidCell`): cell mode, known base cell, no digit 7 at or below
    * the cell's res, all-7 padding below, and no pentagon leading-K
    * subsequence. Returns the resolution. */
  private def requireValid(h: Long): Int = {
    val res = getResolution(h)
    val bc = getBaseCell(h)
    require((h >>> 59) == 1L, s"not a cell-mode H3 index: ${h.toHexString}")
    require(bc < NumBaseCells, s"invalid base cell $bc")
    var r = 1
    while (r <= res) {
      require(getDigit(h, r) != 7,
        s"invalid digit 7 at res $r in ${h.toHexString}")
      r += 1
    }
    while (r <= MaxRes) {
      require(getDigit(h, r) == 7,
        s"unused digit not 7 at res $r in ${h.toHexString}")
      r += 1
    }
    require(!IsPent(bc) || leadingNonZeroDigit(h) != 1,
      s"pentagon deleted-K subsequence in ${h.toHexString}")
    res
  }

  @inline private def setRes(h: Long, res: Int): Long =
    (h & ~(0xFL << 52)) | (res.toLong << 52)

  /** h3lib `cellToParent`: the res-`parentRes` ancestor — truncate the
    * digit path (digits parentRes+1..res become the 7 padding). */
  def cellToParent(h: Long, parentRes: Int): Long = {
    val res = requireValid(h)
    require(parentRes >= 0 && parentRes <= res,
      s"parent res $parentRes out of [0, $res]")
    var out = setRes(h, parentRes)
    var r = parentRes + 1
    while (r <= res) { out = setDigit(out, r, 7); r += 1 }
    out
  }

  /** h3lib `cellToCenterChild`: the res-`childRes` descendant on the
    * all-zero digit path (always valid — a leading K cannot appear). */
  def cellToCenterChild(h: Long, childRes: Int): Long = {
    val res = requireValid(h)
    require(childRes >= res && childRes <= MaxRes,
      s"child res $childRes out of [$res, $MaxRes]")
    var out = setRes(h, childRes)
    var r = res + 1
    while (r <= childRes) { out = setDigit(out, r, 0); r += 1 }
    out
  }

  @inline private def pow7(k: Int): Long = {
    var n = 1L; var i = 0
    while (i < k) { n *= 7L; i += 1 }
    n
  }

  /** h3lib `cellToChildrenSize`: 7^k for hexagons; pentagons lose the
    * whole leading-K subtree at every level: 1 + 5·(7^k − 1)/6. */
  def childrenSize(h: Long, childRes: Int): Long = {
    val res = requireValid(h)
    require(childRes >= res && childRes <= MaxRes,
      s"child res $childRes out of [$res, $MaxRes]")
    val k = childRes - res
    if (isPentagon(h)) 1L + 5L * (pow7(k) - 1L) / 6L else pow7(k)
  }

  /** h3lib `cellToChildren`: every res-`childRes` descendant, in
    * ascending 64-bit index order (digit positions are descending bit
    * positions, so depth-first ascending-digit emission IS numeric
    * order). Pentagon-rooted paths skip digit 1 until a nonzero digit
    * anchors the orientation. */
  def cellToChildren(h: Long, childRes: Int): Array[Long] = {
    val res = requireValid(h)
    require(childRes >= res && childRes <= MaxRes,
      s"child res $childRes out of [$res, $MaxRes]")
    val size = childrenSize(h, childRes)
    // 7^12 > Int.MaxValue: an unchecked toInt would wrap to a negative
    // (or wrong-size) array instead of a diagnosable error
    require(size <= Int.MaxValue,
      s"cellToChildren: $size children (res $res -> $childRes) exceed " +
        "array addressing; materialize via uncompact/explode instead")
    val out = new Array[Long](size.toInt)
    var n = 0
    def rec(cur: Long, r: Int, pentPath: Boolean): Unit = {
      if (r > childRes) { out(n) = cur; n += 1 }
      else {
        var d = 0
        while (d < 7) {
          if (!(pentPath && d == 1))
            rec(setDigit(cur, r, d), r + 1, pentPath && d == 0)
          d += 1
        }
      }
    }
    rec(setRes(h, childRes), res + 1, isPentagon(h))
    require(n == out.length, s"children count mismatch for ${h.toHexString}")
    out
  }

  /** h3lib `compactCells`: replace every complete sibling set (all 7
    * children — 6 for a pentagon parent) by its parent, repeated to
    * res 0. Input must be distinct cells of ONE resolution (h3lib's
    * contract); output is the minimal equivalent cover, sorted.
    * Pure/local form — the distributed form over a cell column is
    * [[graft.ops.H3Compact]], which calls this per co-grouped ancestor
    * (every merge decision is ancestor-local, so the distributed result
    * is identical by construction). */
  def compactCells(cells: Array[Long]): Array[Long] = {
    if (cells.isEmpty) return Array.emptyLongArray
    val res = requireValid(cells(0))
    var i = 1
    while (i < cells.length) {
      require(requireValid(cells(i)) == res,
        s"mixed resolutions: ${cells(i).toHexString} vs res $res")
      i += 1
    }
    var cur: Array[Long] = cells.distinct
    require(cur.length == cells.length, "duplicate cells in compact input")
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var r = res
    while (r > 0 && cur.nonEmpty) {
      val byParent = cur.groupBy(c => cellToParent(c, r - 1))
      val promoted = scala.collection.mutable.ArrayBuffer.empty[Long]
      byParent.foreach { case (p, kids) =>
        val expected = if (isPentagon(p)) 6 else 7
        if (kids.length == expected) promoted += p else out ++= kids
      }
      cur = promoted.toArray
      r -= 1
    }
    out ++= cur
    out.toArray.sorted
  }

  /** h3lib `uncompactCells`: expand a (mixed-res) cover to uniform
    * res-`res` cells, sorted. The input must be an actual cover — no
    * cell an ancestor of another — or the output carries duplicates. */
  def uncompactCells(cells: Array[Long], res: Int): Array[Long] =
    cells.flatMap(cellToChildren(_, res)).sorted

  // ------------------------------------------------------------------
  // Cell boundary (h3lib `cellToBoundary`): the cell's polygon
  // vertices. A hexagon cell IS the Voronoi cell of its center in the
  // owning chart's gnomonic lattice, so each corner is the planar
  // circumcenter of the three mutually-adjacent cell centers — for an
  // equilateral lattice triangle that circumcenter is its CENTROID,
  // i.e. the substrate lattice point c + (u_i + u_{i+1})/3.
  //
  // SUBSTRATE EDGE-ISOMETRY MAPPING (round 14, closing the round-13
  // enumerated fallback set): corners live EXACTLY on the 3×-scaled
  // ("substrate") lattice — 3·center + u_i + u_{i+1} is integer — and
  // the derived face-edge isometries act on the substrate as the same
  // 60°·c rotation with a 3× translation. So every corner's owning
  // chart and its exact lattice coordinate there are computed by
  // [[overageNormalizeSub]]: hop the strictly-violated face edge
  // (most-violated first, exact integer sidedness tests — this is
  // h3lib's own per-vertex substrate `_adjustOverage`, re-derived),
  // then canonicalize on-boundary points to the minimal face index of
  // their edge orbit (a corner ON an icosahedron edge belongs to two
  // charts that agree exactly there; a corner AT an icosahedron vertex
  // to five). Every generating cell reaches the identical (face, a, b)
  // integers, so shared corners are bit-canonical BY CONSTRUCTION —
  // no ring-neighbor search, no float face-ownership ties (the round-13
  // ADVICE), and no home-chart fallback set (the round-13 7/14/24
  // residual is eliminated, spec-pinned at 0).
  //
  // Remaining documented divergence vs h3lib: the PLAIN form inserts no
  // edge-crossing DISTORTION vertices (h3lib emits up to 10 vertices
  // for face-straddling hexagons; this surface always emits the 6 true
  // corners). The full-parity form with exact distortion vertices is
  // [[cellToBoundaryFull]]. Pentagon corners adopt their flanking
  // hexagons' substrate-exact corners (always resolved since this
  // round — the 2/0/9/0 skeleton residual is eliminated too).
  // ------------------------------------------------------------------

  /** CCW unit neighbor directions in axial (a,b) coords — see
    * [[ijkToHex2d]]'s x = a − b/2 convention: ±i=(1,0), −k=(1,1),
    * +j=(0,1), at 60° steps. */
  private val BoundaryDirs: Array[(Int, Int)] =
    Array((1, 0), (1, 1), (0, 1), (-1, 0), (-1, -1), (0, -1))

  /** h3lib `cellToBoundary`: the cell's polygon vertices as
    * (latDeg, lngDeg), in ring order, without repeating the first
    * vertex — 6 for hexagons, 5 for pentagon cells. */
  def cellToBoundary(h: Long): Array[(Double, Double)] =
    cellToBoundaryResolved(h)._1

  /** [[cellToBoundary]] plus a (historical) fallback bitmask — ALWAYS 0
    * since round 14: every corner resolves to its owning chart through
    * the exact substrate isometries. The mask stays in the signature as
    * the spec hook pinning that the fallback set is empty. */
  private[functions] def cellToBoundaryResolved(
      h: Long): (Array[(Double, Double)], Int) = {
    requireValid(h)
    if (isPentagon(h)) return (pentagonBoundary(h), 0)
    val res = getResolution(h)
    val (face, i, j, k, _, _) = resolveChart(h)
    val a3 = 3L * (i - k)
    val b3 = 3L * (j - k)
    val out = new Array[(Double, Double)](6)
    var v = 0
    while (v < 6) {
      val (a1, b1) = BoundaryDirs(v)
      val (a2, b2) = BoundaryDirs((v + 1) % 6)
      val (fo, ca3, cb3) =
        overageNormalizeSub(face, a3 + a1 + a2, b3 + b1 + b2, res)
      val (latR, lngR) =
        hex2dToGeo(fo, (ca3 - 0.5 * cb3) / 3.0, cb3 * Sin60 / 3.0, res)
      out(v) = (toDegrees(latR), toDegrees(lngR))
      v += 1
    }
    (out, 0)
  }

  /** Owning chart of a SUBSTRATE (3×-scaled) axial coordinate — the
    * per-corner analog of [[overageNormalize]] (h3lib's per-vertex
    * substrate `_adjustOverage`). Phase 1 hops the strictly-violated
    * face edge (most-violated first) through the derived isometries
    * (rotation unchanged, translation ×3 — the edge map is linear);
    * phase 2 canonicalizes boundary points: a coordinate lying ON a
    * face edge (exact integer sidedness 0) belongs to every chart in
    * its edge orbit (two across an edge, five around an icosahedron
    * vertex — the pentagon-quotient orbit), all of which agree exactly
    * there, and the MINIMAL face index is taken so every generating
    * cell canonicalizes the shared corner identically. Orbit-walk
    * consistency (two paths reaching one face must carry the same
    * coordinate) is a loud require — it would only fire if the derived
    * isometries violated the vertex orbit law. */
  private def overageNormalizeSub(face0: Int, a0: Long, b0: Long,
      res: Int): (Int, Long, Long) = {
    val w = TriW(res)
    // violation of edge e for substrate point (a,b): > 0 strictly
    // outside, 0 exactly on the edge line, < 0 strictly inside
    @inline def viol(a: Long, b: Long, e: Int): Long = {
      val wi = w(e); val wj = w((e + 1) % 3)
      val ea = wj._1 - wi._1; val eb = wj._2 - wi._2
      val cross = ea * (b - 3 * wi._2) - (a - 3 * wi._1) * eb
      val crossO = ea * (0L - 3 * wi._2) - (0L - 3 * wi._1) * eb
      if (crossO > 0) -cross else cross
    }
    @inline def step(f: Int, a: Long, b: Long, e: Int): (Int, Long, Long) = {
      val c = EdgeRot(f)(e)(res)
      var xa = a; var xb = b
      var k = 0
      while (k < c) { val t = xa - xb; xb = xa; xa = t; k += 1 }
      (EdgeFace(f)(e), xa + 3 * EdgeTA(f)(e)(res), xb + 3 * EdgeTB(f)(e)(res))
    }
    var f = face0; var a = a0; var b = b0
    var hop = 0
    var moved = true
    while (moved && hop < 8) {
      moved = false
      var worst = -1; var worstMag = 0L
      var e = 0
      while (e < 3) {
        val vl = viol(a, b, e)
        if (vl > 0 && vl > worstMag) { worstMag = vl; worst = e }
        e += 1
      }
      if (worst >= 0) {
        val (nf, na, nb) = step(f, a, b, worst)
        f = nf; a = na; b = nb
        moved = true
      }
      hop += 1
    }
    require((0 until 3).forall(e => viol(a, b, e) <= 0),
      s"substrate overage did not converge: face $face0 ($a0,$b0) res $res")
    if ((0 until 3).exists(e => viol(a, b, e) == 0)) {
      val seen = scala.collection.mutable.Map.empty[Int, (Long, Long)]
      def walk(f0: Int, wa: Long, wb: Long): Unit = seen.get(f0) match {
        case Some(prev) =>
          require(prev == ((wa, wb)),
            s"vertex orbit inconsistent at face $f0: $prev vs ($wa,$wb)")
        case None =>
          seen(f0) = (wa, wb)
          var e = 0
          while (e < 3) {
            if (viol(wa, wb, e) == 0) {
              val (nf, na, nb) = step(f0, wa, wb, e)
              walk(nf, na, nb)
            }
            e += 1
          }
      }
      walk(f, a, b)
      val fMin = seen.keys.min
      val (ma, mb) = seen(fMin)
      (fMin, ma, mb)
    } else (f, a, b)
  }

  /** h3lib `cellToBoundary` WITH edge-crossing DISTORTION vertices
    * (round 13, completing the boundary-parity advice): h3lib emits an
    * extra vertex wherever a cell edge crosses an icosahedron face
    * edge (up to 10 vertices for a face-straddling hexagon), because
    * the gnomonic lattice edge bends there on the sphere. Faces are
    * the Voronoi regions of the 20 face centers, so a face edge IS the
    * perpendicular-bisector great circle of two face centers, and the
    * distortion vertex is the EXACT intersection of the cell edge's
    * great circle (normal p×q) with that bisector plane (normal
    * c_a−c_b) — computed in closed form once a subdivision walk along
    * the edge has located which face pair each crossing separates
    * (the subdivision only identifies the pair and the ordering; the
    * emitted point is exact regardless of the walk's depth). Cells
    * whose corners all sit on one face return [[cellToBoundary]]
    * verbatim. Laws (on-both-circles, between-corners, count =
    * sampled face changes, straddle-free identity) are exhaustively
    * spec-pinned at res 0–2 in `H3Spec`. */
  def cellToBoundaryFull(h: Long): Array[(Double, Double)] =
    cellToBoundaryFullMarked(h)._1

  /** [[cellToBoundaryFull]] plus a parallel flags array: true = an
    * inserted distortion vertex, false = a true corner. Test hook. */
  private[functions] def cellToBoundaryFullMarked(
      h: Long): (Array[(Double, Double)], Array[Boolean]) = {
    val corners = cellToBoundary(h)
    val n = corners.length
    def unit(p: (Double, Double)): Array[Double] = {
      val la = toRadians(p._1); val lo = toRadians(p._2)
      Array(cos(la) * cos(lo), cos(la) * sin(lo), sin(la))
    }
    def faceOf(v: Array[Double]): Int = {
      var best = 0; var bd = -2.0; var f = 0
      while (f < 20) {
        val d = v(0) * FaceX(f) + v(1) * FaceY(f) + v(2) * FaceZ(f)
        if (d > bd) { bd = d; best = f }
        f += 1
      }
      best
    }
    def cross(a: Array[Double], b: Array[Double]): Array[Double] =
      Array(a(1) * b(2) - a(2) * b(1), a(2) * b(0) - a(0) * b(2),
        a(0) * b(1) - a(1) * b(0))
    def mid(a: Array[Double], b: Array[Double]): Array[Double] = {
      val m = Array(a(0) + b(0), a(1) + b(1), a(2) + b(2))
      val l = sqrt(m(0) * m(0) + m(1) * m(1) + m(2) * m(2))
      Array(m(0) / l, m(1) / l, m(2) / l)
    }
    val us = corners.map(unit)
    val fs = us.map(faceOf)
    val outP = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    val outM = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    def slerp(a: Array[Double], b: Array[Double], t: Double)
        : Array[Double] = {
      val om = acos(max(-1.0, min(1.0,
        a(0) * b(0) + a(1) * b(1) + a(2) * b(2))))
      if (om < 1e-12) a
      else {
        val sa = sin((1 - t) * om) / sin(om)
        val sb = sin(t * om) / sin(om)
        val m = Array(sa * a(0) + sb * b(0), sa * a(1) + sb * b(1),
          sa * a(2) + sb * b(2))
        val l = sqrt(m(0) * m(0) + m(1) * m(1) + m(2) * m(2))
        Array(m(0) / l, m(1) / l, m(2) / l)
      }
    }
    var v = 0
    while (v < n) {
      val p = us(v); val q = us((v + 1) % n)
      outP += corners(v); outM += false
      // Crossing detection runs UNCONDITIONALLY: an edge can enter a
      // neighboring face region and return (both corners on one face,
      // two crossings — routine for res-0 edges clipping a face
      // corner), so an endpoint-face gate would miss pairs. 256 uniform
      // samples isolate every change interval (face incursions along a
      // cell edge are never narrower than a fraction of the edge), then
      // each interval bisects 48 deep before the closed-form point.
      val gc = cross(p, q) // full-edge great-circle normal
      val gcl = sqrt(gc(0) * gc(0) + gc(1) * gc(1) + gc(2) * gc(2))
      // exact crossing between the face-fa / face-fb Voronoi regions
      // on this edge's great circle, oriented into the (a, b) sub-arc.
      // None = ALONG-EDGE degenerate: the cell edge runs (numerically)
      // inside the face-boundary great circle itself — routine for
      // res-0 cells whose edges lie on icosahedron edges. Face identity
      // flickers at float noise along such an arc, but the arc is a
      // single great circle on the boundary — straight in BOTH charts —
      // so no distortion bend exists and h3lib's substrate walk (which
      // canonicalizes boundary vertices to one face) emits nothing.
      def exact(fa: Int, fb: Int, a: Array[Double],
          b: Array[Double]): Option[(Double, Double)] = {
        val n2 = Array(FaceX(fa) - FaceX(fb), FaceY(fa) - FaceY(fb),
          FaceZ(fa) - FaceZ(fb))
        val n2l = sqrt(n2(0) * n2(0) + n2(1) * n2(1) + n2(2) * n2(2))
        val d = cross(gc, n2)
        val l = sqrt(d(0) * d(0) + d(1) * d(1) + d(2) * d(2))
        if (l < 1e-3 * gcl * n2l) None // tangent/along-edge: no bend
        else {
          val s = d(0) * (a(0) + b(0)) + d(1) * (a(1) + b(1)) +
            d(2) * (a(2) + b(2))
          val sg = if (s >= 0) 1.0 else -1.0
          val x = Array(sg * d(0) / l, sg * d(1) / l, sg * d(2) / l)
          Some((toDegrees(asin(max(-1.0, min(1.0, x(2))))),
            toDegrees(atan2(x(1), x(0)))))
        }
      }
      // A crossing can coincide with a corner (res-0 corners sit ON
      // icosahedron edges) or with the previous crossing — emit
      // neither (h3lib never duplicates vertices). Chordal 1e-9
      // (cos of a 1e-9 angle is 1.0 in double).
      var lastEmit: Array[Double] = null
      def emit(pt: (Double, Double)): Unit = {
        val x = unit(pt)
        def near(y: Array[Double]) = {
          val dx = x(0) - y(0); val dy = x(1) - y(1); val dz = x(2) - y(2)
          dx * dx + dy * dy + dz * dz < 1e-18
        }
        if (!near(p) && !near(q) &&
            (lastEmit == null || !near(lastEmit))) {
          outP += pt; outM += true; lastEmit = x
        }
      }
      def bisect(a0: Array[Double], fa0: Int, b0: Array[Double],
          fb0: Int, depth: Int): Unit = {
        var a = a0; var fa = fa0; var b = b0; var fb = fb0
        var d = depth
        while (d > 0) {
          val m = mid(a, b); val fm = faceOf(m)
          if (fm == fa) { a = m }
          else if (fm == fb) { b = m }
          else { // a third face inside the interval: split
            bisect(a, fa, m, fm, d - 1)
            bisect(m, fm, b, fb, d - 1)
            return
          }
          d -= 1
        }
        exact(fa, fb, a, b).foreach(emit)
      }
      val Samples = 256
      var prev = p; var fPrev = fs(v)
      var s = 1
      while (s <= Samples) {
        val cur = if (s == Samples) q else slerp(p, q, s.toDouble / Samples)
        val fCur = if (s == Samples) fs((v + 1) % n) else faceOf(cur)
        if (fCur != fPrev) bisect(prev, fPrev, cur, fCur, 48)
        prev = cur; fPrev = fCur
        s += 1
      }
      v += 1
    }
    (outP.toArray, outM.toArray)
  }

  /** Pentagon boundary. Corner skeleton: spherical centroid of each
    * (center, nᵢ, nᵢ₊₁) triple over the azimuth-ordered exact ring-1
    * neighbor centers — the same point as h3lib's to second order in
    * the pitch. UPGRADE (round 13, second half): every pentagon corner
    * is ALSO a corner of its two flanking ring-1 HEXAGONS, whose
    * corners are per-face exact since this round — so each corner
    * adopts the matched neighbor corner (nearest to the skeleton
    * approximation; corner spacing is ~0.58 pitch vs a second-order
    * approximation error, so the match is unambiguous) whenever that
    * neighbor corner itself resolved to its owning chart. Both
    * flanking hexagons compute a resolved shared corner in the SAME
    * owning chart (ulp-identical — spec-pinned), so the choice of
    * flank doesn't matter. The spherical-centroid skeleton survives
    * only where BOTH flanks' matched corners are home-chart fallbacks
    * (enumerated in H3Spec alongside the hexagon fallback set). */
  private def pentagonBoundary(h: Long): Array[(Double, Double)] = {
    val (cLat, cLng) = cellToLatLng(h)
    val cLatR = toRadians(cLat); val cLngR = toRadians(cLng)
    val nbrs = gridRing1(h).map { n =>
      val (la, lo) = cellToLatLng(n)
      (geoAzimuth(cLatR, cLngR, toRadians(la), toRadians(lo)), la, lo, n)
    }.sortBy(_._1)
    require(nbrs.length == 5, s"pentagon ring size ${nbrs.length}")
    val cv = Array(cos(cLatR) * cos(cLngR), cos(cLatR) * sin(cLngR),
      sin(cLatR))
    // per-face-exact corner sets of the five flanking hexagons (a
    // pentagon's ring-1 is always 5 hexagons: pentagon base cells are
    // never adjacent), with their fallback marks
    val flank = nbrs.map { case (_, _, _, n) =>
      if (isPentagon(n)) null else cellToBoundaryResolved(n)
    }
    def unitOf(latDeg: Double, lngDeg: Double): Array[Double] = {
      val p = toRadians(latDeg); val q = toRadians(lngDeg)
      Array(cos(p) * cos(q), cos(p) * sin(q), sin(p))
    }
    Array.tabulate(5) { v =>
      val (_, la1, lo1, _) = nbrs(v)
      val (_, la2, lo2, _) = nbrs((v + 1) % 5)
      val (p1, q1) = (toRadians(la1), toRadians(lo1))
      val (p2, q2) = (toRadians(la2), toRadians(lo2))
      val x = cv(0) + cos(p1) * cos(q1) + cos(p2) * cos(q2)
      val y = cv(1) + cos(p1) * sin(q1) + cos(p2) * sin(q2)
      val z = cv(2) + sin(p1) + sin(p2)
      val n = sqrt(x * x + y * y + z * z)
      val approx = (toDegrees(asin(z / n)), toDegrees(atan2(y, x)))
      val av = unitOf(approx._1, approx._2)
      // adopt the nearest RESOLVED corner of either flank; threshold
      // self-scaled by the flank's own circumradius (nearest corner of
      // the right flank is second-order close; any other corner is
      // ≥ ~0.58 pitch away)
      var best: (Double, Double) = null
      var bestD = Double.MaxValue
      Seq(v, (v + 1) % 5).foreach { fi =>
        val fb = flank(fi)
        if (fb != null) {
          val (corners, marks) = fb
          val (fla, flo) = (nbrs(fi)._2, nbrs(fi)._3)
          val fcv = unitOf(fla, flo)
          var w = 0
          while (w < corners.length) {
            if ((marks & (1 << w)) == 0) {
              val u = unitOf(corners(w)._1, corners(w)._2)
              val dx = u(0) - av(0); val dy = u(1) - av(1)
              val dz = u(2) - av(2)
              val d2 = dx * dx + dy * dy + dz * dz
              val cx = u(0) - fcv(0); val cy = u(1) - fcv(1)
              val cz = u(2) - fcv(2)
              val r2 = cx * cx + cy * cy + cz * cz // flank circumradius²
              if (d2 < 0.09 * r2 && d2 < bestD) { bestD = d2; best = corners(w) }
            }
            w += 1
          }
        }
      }
      // flanks always resolve by construction since round 14 (substrate
      // edge isometries) — a silent fall-back to the spherical-centroid
      // skeleton would be invisible to the fallback-mask hook, so make
      // the invariant LOUD instead (ADVICE r14)
      require(best != null,
        f"pentagonBoundary: no resolved flank corner for vertex $v " +
          f"of 0x$h%x — flank corner resolution regressed")
      best
    }
  }

  /** Owning chart face of a cell (test hook: the exactness domain of
    * [[cellToBoundary]] is a ring whose cells share one chart). */
  private[functions] def chartFace(h: Long): Int = resolveChart(h)._1

  /** Owning face of a point (test hook for the distortion-vertex
    * laws: faces are the Voronoi regions of the face centers). */
  private[functions] def faceOfPoint(latDeg: Double, lngDeg: Double): Int =
    nearestFace(toRadians(latDeg), toRadians(lngDeg))

  /** Face-center unit vector (test hook for the bisector laws). */
  private[functions] def faceCenter(f: Int): Array[Double] =
    Array(FaceX(f), FaceY(f), FaceZ(f))

  /** Test hook: whether a cell's base cell is in [[PentProximal]] —
    * the gridDistance flat path's exclusion set. */
  private[functions] def isPentProximalCell(h: Long): Boolean =
    PentProximal(getBaseCell(h))

  // ------------------------------------------------------------------
  // Grid distance (h3lib `gridDistance`): length of the shortest
  // grid path between two same-res cells. Fast path: express both
  // cells' overage-normalized lattice coordinates in ONE chart —
  // directly when they share their owning face, else through the
  // derived face-neighbor isometry (exact by the spec-pinned
  // cross-chart consistency law) — and read the axial hex distance
  // off the flat lattice. The flat formula is exact whenever a
  // shortest path stays inside the shared double-chart and sees no
  // pentagon (the 12 curvature defects); the guard is therefore on
  // PROXIMITY, not just endpoint identity — any pair touching a
  // pentagon base cell OR one of its neighboring base cells (where a
  // shortest path could still graze the defect) takes the exact BFS
  // arm; likewise non-adjacent owning faces. The BFS throws past its
  // cap exactly like h3lib errors on far/distorted pairs.
  // `GridDistSpec` pins flat == BFS over random pairs incl.
  // cross-face ones.
  // ------------------------------------------------------------------

  /** Hex distance on the axial lattice whose unit moves are ±(1,0),
    * ±(0,1), ±(1,1): same-sign offsets ride the (1,1) diagonal. */
  @inline private def axialDist(da: Long, db: Long): Long =
    if ((da >= 0) == (db >= 0)) max(abs(da), abs(db))
    else abs(da) + abs(db)

  /** BFS distance cap for the exact fallback: beyond this the pair is
    * rejected (h3lib's gridDistance likewise fails on far pairs). */
  private val GridDistBfsCap = 64

  /** Base cells that are pentagons OR grid-adjacent to one — the flat
    * fast path's exclusion set. Endpoint base cells being hexagons is
    * NOT enough: a shortest path between cells in pentagon-ADJACENT
    * base cells can still route through the pentagon's curvature
    * defect near an icosahedron vertex, where the 6-regular axial
    * distance formula undercounts (h3lib errors on such pairs rather
    * than answer). One full base cell of separation keeps every flat
    * corridor a base-cell inradius away from the nearest defect
    * (`GridDistSpec` pins flat == BFS over the remaining domain,
    * including pairs in this second ring around each pentagon). */
  private lazy val PentProximal: Array[Boolean] = {
    val out = new Array[Boolean](NumBaseCells)
    for (b <- 0 until NumBaseCells if IsPent(b)) {
      out(b) = true
      val res0 = (1L << 59) | (b.toLong << 45) | ((1L << 45) - 1)
      for (nb <- gridRing1(res0)) out(getBaseCell(nb)) = true
    }
    out
  }

  def gridDistance(ha: Long, hb: Long): Int = {
    val res = requireValid(ha)
    require(requireValid(hb) == res,
      s"resolution mismatch: ${ha.toHexString} vs ${hb.toHexString}")
    if (ha == hb) return 0
    val pentTouched =
      PentProximal(getBaseCell(ha)) || PentProximal(getBaseCell(hb))
    if (!pentTouched) {
      val (fa, ia, ja, ka, _, _) = resolveChart(ha)
      val (fb, ib, jb, kb, _, _) = resolveChart(hb)
      var aA = ia - ka; var aB = ja - ka
      val bA = ib - kb; val bB = jb - kb
      if (fa == fb) return axialDist(aA - bA, aB - bB).toInt
      var e = 0
      while (e < 3) {
        if (EdgeFace(fa)(e) == fb) {
          // p_G = R(60°·c)·p_F + T_r — same map the consistency law pins
          val c = EdgeRot(fa)(e)(res)
          var n = 0
          while (n < c) { val t = aA - aB; aB = aA; aA = t; n += 1 }
          return axialDist(
            aA + EdgeTA(fa)(e)(res) - bA,
            aB + EdgeTB(fa)(e)(res) - bB).toInt
        }
        e += 1
      }
    }
    // exact fallback: ring-by-ring BFS (each ring is exact traversal)
    var k = 1
    while (k <= GridDistBfsCap) {
      if (gridDisk(ha, k).contains(hb)) return k
      k += 1
    }
    throw new IllegalArgumentException(
      f"gridDistance: 0x$ha%x and 0x$hb%x are farther than " +
        f"$GridDistBfsCap or pentagon-distorted")
  }

  def gridDistanceHex(a: String, b: String): Int =
    gridDistance(java.lang.Long.parseUnsignedLong(a, 16),
      java.lang.Long.parseUnsignedLong(b, 16))

  /** h3lib `gridPathCells`, canonicalized (round 14): a minimal grid
    * path from `ha` to `hb` inclusive — length gridDistance+1. h3lib
    * explicitly disclaims WHICH minimal path its lerp-based
    * implementation returns ("output may change across library
    * versions"), so this surface defines the path deterministically
    * instead of chasing an unspecified choice: at every step the next
    * cell is the SMALLEST id among current neighbors that reduce the
    * remaining distance (min-id greedy — each step's candidate set is
    * non-empty on any connected domain, so the greedy is total and
    * yields exactly gridDistance+1 cells). Engine-independently
    * restatable — the DuckDB oracle recomputes the same path from its
    * probe-witnessed adjacency relation alone — and cross-checked
    * against a brute-force enumeration in `H3Spec`. Inherits
    * [[gridDistance]]'s domain (throws past the BFS cap, exactly where
    * h3lib errors). Cost O(dist · 6 · gridDistance) — a gated-query /
    * small-k primitive, not a scan-side kernel. */
  def gridPathCells(ha: Long, hb: Long): Array[Long] = {
    var remaining = gridDistance(ha, hb)
    val out = new Array[Long](remaining + 1)
    out(0) = ha
    var cur = ha
    var i = 1
    while (remaining > 0) {
      // candidates: neighbors one step closer to hb; ids are positive
      // (mode bit 59), so Long min is unsigned-consistent
      var best = Long.MaxValue
      val ring = gridRing1(cur)
      var r = 0
      while (r < ring.length) {
        val c = ring(r)
        // a neighbor FURTHER from hb than the BFS cap throws inside its
        // own gridDistance even when (ha, hb) itself is in-domain (pair
        // at exactly the cap, neighbor at cap+1) — a throwing neighbor
        // is simply a non-candidate, matching the spec's brute-force
        // candidate-set construction (ADVICE r14)
        if (c < best) {
          val closer =
            try gridDistance(c, hb) == remaining - 1
            catch { case _: IllegalArgumentException => false }
          if (closer) best = c
        }
        r += 1
      }
      require(best != Long.MaxValue,
        f"gridPathCells: no descending neighbor at 0x$cur%x (ring " +
          "incomplete?)")
      out(i) = best
      cur = best
      i += 1
      remaining -= 1
    }
    out
  }

  def gridPathCellsHex(a: String, b: String): Array[String] =
    gridPathCells(java.lang.Long.parseUnsignedLong(a, 16),
      java.lang.Long.parseUnsignedLong(b, 16))
      .map(h => java.lang.Long.toHexString(h))

  /** WKT POLYGON form of [[cellToBoundary]] (lng-lat vertex order,
    * ring closed) — the export format of the engine's other geometry
    * functions, parseable by [[GeoF.parseRings]]/polyfill. */
  def cellBoundaryWkt(hex: String): String = {
    val vs = cellToBoundary(java.lang.Long.parseUnsignedLong(hex, 16))
    val body = (vs :+ vs.head)
      .map { case (lat, lng) => s"$lng $lat" }.mkString(", ")
    s"POLYGON(($body))"
  }

  /** WKT form of [[cellToBoundaryFull]] (corners + distortion
    * vertices) — full h3lib vertex parity for face-straddling cells. */
  def cellBoundaryFullWkt(hex: String): String = {
    val vs = cellToBoundaryFull(java.lang.Long.parseUnsignedLong(hex, 16))
    val body = (vs :+ vs.head)
      .map { case (lat, lng) => s"$lng $lat" }.mkString(", ")
    s"POLYGON(($body))"
  }

  // Hex-string forms (the engine's cell columns are canonical
  // lowercase 15-hex strings).
  def cellToParentHex(hex: String, parentRes: Int): String =
    f"${cellToParent(java.lang.Long.parseUnsignedLong(hex, 16), parentRes)}%x"

  def cellToChildrenHex(hex: String, childRes: Int): Array[String] =
    cellToChildren(java.lang.Long.parseUnsignedLong(hex, 16), childRes)
      .map(c => f"$c%x")

  def compactCellsHex(cells: Array[String]): Array[String] =
    compactCells(cells.map(java.lang.Long.parseUnsignedLong(_, 16)))
      .map(c => f"$c%x")

  def uncompactCellsHex(cells: Array[String], res: Int): Array[String] =
    uncompactCells(
      cells.map(java.lang.Long.parseUnsignedLong(_, 16)), res)
      .map(c => f"$c%x")

  /** Derived base-cell orientation table dump, for authoring external
    * oracles: rows (face, i, j, k, baseCell, ccwRot60, isPentagon,
    * cwOffset). Coordinates are normalized res-0 ijk on `face`. */
  def baseCellTable: IndexedSeq[(Int, Int, Int, Int, Int, Int, Boolean, Boolean)] =
    for {
      f <- 0 until 20; i <- 0 to 2; j <- 0 to 2; k <- 0 to 2
      idx = tabIdx(f, i, j, k) if TabBc(idx) >= 0
    } yield {
      val bc = TabBc(idx)
      (f, i, j, k, bc, TabRot(idx), IsPent(bc), PentCwOffset(bc * 32 + f))
    }



}
