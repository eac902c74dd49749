package graft.functions

object H3CoordDbg {
  def main(args: Array[String]): Unit = {
    for (r <- Seq(0, 1, 2, 3)) H3.probeCoordConsistency(r)
  }
}
