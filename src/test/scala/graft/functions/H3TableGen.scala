package graft.functions

/** Regenerates the `bctab` VALUES literal embedded in
  * `graft.queries.H3OracleSql` from the live derivation (run with
  * `sbt "Test/runMain graft.functions.H3TableGen"` and splice the
  * output between the VALUES header and closing paren). */
object H3TableGen {
  def main(args: Array[String]): Unit = {
    val rows = H3.baseCellTable.map { case (f, i, j, k, bc, rot, pent, cw) =>
      s"($f,$i,$j,$k,$bc,$rot,${if (pent) 1 else 0},${if (cw) 1 else 0})"
    }
    rows.grouped(6).foreach { g =>
      println("      |    " + g.mkString(", ") + ",")
    }
  }
}
