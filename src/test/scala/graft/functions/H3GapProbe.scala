package graft.functions

/** Stitching-gap incidence probe (not a spec — run with
  * `sbt "Test/runMain graft.functions.H3GapProbe [n] [seed]"`).
  *
  * Measures, over uniform random cells across all resolutions, how many
  * gridRing1 calls come back short of the structural neighbor count
  * (6, or 5 at a pentagon) and how many directed adjacencies are
  * asymmetric — the base-cell boundary stitching gap PLANS.md round 11
  * bounds at ≤2%. Run before/after the overage-normalization repair.
  */
object H3GapProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    val seed = if (args.length > 1) args(1).toLong else 20260815L
    val rnd = new scala.util.Random(seed)
    var short = 0
    var asym = 0
    var cells = 0
    var dirs = 0
    val examples = scala.collection.mutable.ArrayBuffer.empty[String]
    val t0 = System.nanoTime()
    for (_ <- 1 to n) {
      val lat = math.toDegrees(math.asin(rnd.nextDouble() * 2 - 1))
      val lng = rnd.nextDouble() * 360.0 - 180.0
      val res = rnd.nextInt(16)
      val h = H3.latLngToCell(lat, lng, res)
      val ring = H3.gridRing1(h)
      val expected = if (H3.isPentagon(h)) 5 else 6
      cells += 1
      dirs += expected
      if (ring.length < expected) {
        short += expected - ring.length
        if (examples.size < 12)
          examples += f"short: 0x$h%x res $res (${ring.length}/$expected) " +
            f"at ($lat%.4f, $lng%.4f) bc ${H3.getBaseCell(h)}"
      }
      if (ring.length > expected)
        examples += f"FALSE POSITIVE: 0x$h%x res $res ring ${ring.length}"
      ring.foreach { c =>
        if (!H3.gridRing1(c).contains(h)) {
          asym += 1
          if (examples.size < 12)
            examples += f"asym: 0x$c%x does not see 0x$h%x back (res $res)"
        }
      }
    }
    val ms = (System.nanoTime() - t0) / 1e6
    println(f"cells=$cells directed=$dirs short=$short asym=$asym " +
      f"gap=${(short + asym) * 100.0 / dirs}%.3f%% time=${ms}%.0f ms")
    examples.foreach(e => println("  " + e))
  }
}
