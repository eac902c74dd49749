package graft.functions

/** Iteration probe for the H3 derivation (not a spec — run with
  * `sbt "Test/runMain graft.functions.H3Probe"`). */
object H3Probe {
  def main(args: Array[String]): Unit = {
    def show(lat: Double, lng: Double, res: Int, want: String): Unit = {
      val got =
        try H3.latLngToCellString(lat, lng, res)
        catch { case e: Throwable => s"ERROR ${e.getMessage}" }
      val ok = if (got == want) "OK  " else "FAIL"
      println(s"$ok ($lat, $lng, $res) got=$got want=$want")
    }
    // published vectors (H3 README / h3-js README / quickstarts)
    show(37.7752702151959, -122.418307270836, 9, "8928308280fffff")
    show(37.3615593, -122.0553238, 5, "85283473fffffff")
    show(37.3615593, -122.0553238, 7, "87283472bffffff")
    show(90.0, 0.0, 0, "8001fffffffffff")
    // diagnostics (no hard expectation)
    println("res0 SF      = " + H3.latLngToCellString(37.7752702151959, -122.418307270836, 0))
    println("res0 northP  = " + H3.latLngToCellString(90.0, 0.0, 0))
    println("res10 liberty= " + H3.latLngToCellString(40.689167, -74.044444, 10))
  }
}
