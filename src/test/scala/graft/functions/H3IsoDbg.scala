package graft.functions

/** Off-edge validation probe for the derived face-neighbor isometries
  * (not a spec — `sbt "Test/runMain graft.functions.H3IsoDbg"`).
  *
  * For sample points displaced INTO the neighbor face from points along
  * each shared edge: compares the neighbor-chart lattice rounding of
  * the point (direct) with the isometry image of the home-chart
  * rounding. A correct map disagrees only by sub-half-pitch drift
  * (occasionally one lattice step right at a Voronoi boundary); an
  * orientation/translation error disagrees by whole cells almost
  * everywhere.
  */
object H3IsoDbg {
  def main(args: Array[String]): Unit = {
    val res = if (args.nonEmpty) args(0).toInt else 2
    var total = 0
    var mismatch = 0
    var firstShown = 0
    for (f <- 0 until 20; e <- 0 until 3) {
      val (g, stats) = H3.probeEdgeIso(f, e, res)
      total += stats._1
      mismatch += stats._2
      if (stats._2 > 0 && firstShown < 10) {
        firstShown += 1
        println(s"face $f edge $e -> $g : ${stats._2}/${stats._1} mismatches " +
          s"(first offsets: ${stats._3})")
      }
    }
    println(s"res $res: $mismatch/$total mismatching samples")
  }
}
