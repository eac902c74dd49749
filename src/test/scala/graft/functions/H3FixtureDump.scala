package graft.functions

/** Round-12 oracle-design probe (not a spec — run with
  * `sbt "Test/runMain graft.functions.H3FixtureDump"`).
  *
  * Dumps the ground truth the probe-grid DuckDB oracles for the five
  * rows-only H3 queries are designed against: per-zone res-5/res-3
  * cells, 1-disk members, res-3 zone-pair adjacency, polyfill cells
  * with each center's distance to the zone boundary (the
  * classification margin the staged probe refinement must beat), and
  * the boundary-centroid closure resolution (how deep into the
  * digit-0 center chain the planar boundary centroid re-indexes).
  */
object H3FixtureDump {
  def main(args: Array[String]): Unit = {
    def latOf(k: Int) = k * 0.5 - 6.0
    def lngOf(k: Int) = k * 1.5 - 18.0

    // --- res-5 anchors + rings -------------------------------------
    println("== res-5 anchors + 1-disk ==")
    for (k <- 0 until 25) {
      val c = H3.latLngToCell(latOf(k), lngOf(k), 5)
      val disk = H3.gridDisk(c, 1).sorted
      val pent = H3.isPentagonCell(c)
      println(f"zone $k%2d cell=${java.lang.Long.toHexString(c)} pentbase=$pent disk=${disk.length} " +
        disk.map(java.lang.Long.toHexString).mkString(","))
    }

    // --- res-3 adjacency pairs --------------------------------------
    println("== res-3 spatial-join pairs ==")
    val c3 = (0 until 25).map(k => k -> H3.latLngToCell(latOf(k), lngOf(k), 3))
    for ((a, ca) <- c3; (b, cb) <- c3 if a < b) {
      if (ca == cb) println(s"pair $a $b EQUAL")
      else if (H3.gridDisk(ca, 1).contains(cb))
        println(s"pair $a $b ADJ dist=" + H3.gridDistance(ca, cb))
    }

    // --- res-5 cell geometry in degrees ------------------------------
    println("== res-5 scale ==")
    for (k <- Seq(0, 12, 24)) {
      val c = H3.latLngToCell(latOf(k), lngOf(k), 5)
      val (clat, clng) = H3.cellToLatLng(c)
      val nb = H3.gridDisk(c, 1).filter(_ != c)
      val d = nb.map { n =>
        val (nlat, nlng) = H3.cellToLatLng(n)
        math.hypot(nlat - clat, nlng - clng)
      }
      println(f"zone $k%2d center-spacing deg: min=${d.min}%.4f max=${d.max}%.4f")
    }

    // --- polyfill margins -------------------------------------------
    println("== polyfill res-5 margins ==")
    var worst = Double.MaxValue
    for (k <- 0 until 25) {
      val lat0 = latOf(k); val lng0 = lngOf(k)
      val wkt = s"POLYGON((${lng0 - 0.25} ${lat0 - 0.25}, ${lng0 + 0.25} ${lat0 - 0.25}, " +
        s"${lng0 + 0.25} ${lat0 + 0.25}, ${lng0 - 0.25} ${lat0 + 0.25}, ${lng0 - 0.25} ${lat0 - 0.25}))"
      val cells = GeoF.h3PolyfillScala(wkt, 5)
      // margin of EVERY candidate cell near the zone: scan the disk of
      // each polyfill cell so outside-but-close centers are included
      val cand = cells.flatMap(h =>
        H3.gridDisk(java.lang.Long.parseLong(h, 16), 1)).distinct
      var zmin = Double.MaxValue
      for (c <- cand) {
        val (clat, clng) = H3.cellToLatLng(c)
        val m = Seq(math.abs(clat - (lat0 - 0.25)), math.abs(clat - (lat0 + 0.25)),
          math.abs(clng - (lng0 - 0.25)), math.abs(clng - (lng0 + 0.25))).min
        if (m < zmin) zmin = m
      }
      println(f"zone $k%2d n_cells=${cells.length}%3d min-center-to-boundary=$zmin%.6f deg")
      println(s"polyfill $k " + cells.sorted.mkString(","))
      if (zmin < worst) worst = zmin
    }
    println(f"WORST polyfill margin over all zones: $worst%.6f deg")

    // --- boundary centroid closure depth ------------------------------
    println("== boundary closure ==")
    for (k <- 0 until 25) {
      val c = H3.latLngToCell(latOf(k), lngOf(k), 5)
      val corners = H3.cellToBoundary(c)
      val clat = corners.map(_._1).sum / corners.length
      val clng = corners.map(_._2).sum / corners.length
      // does forward(centroid, r) land on the digit-0 chain of c for r>5?
      def chainCell(r: Int): Long = {
        // c with res field r and digits 6..r set to 0
        var h = c
        h = (h & ~(15L << 52)) | (r.toLong << 52)
        for (d <- 6 to r) h = h & ~(7L << ((15 - d) * 3))
        h
      }
      val depth = (5 to 11).takeWhile { r =>
        H3.latLngToCell(clat, clng, r) == chainCell(r)
      }.lastOption.getOrElse(-1)
      val (ctLat, ctLng) = H3.cellToLatLng(c)
      val off = math.hypot(clat - ctLat, clng - ctLng)
      println(f"zone $k%2d n_corners=${corners.length} closure-depth=$depth centroid-off=$off%.2e deg")
    }
  }
}
