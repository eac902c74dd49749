package graft.functions

/** Table-consistency probe (not a spec — run with
  * `sbt "Test/runMain graft.functions.H3TabDbg"`).
  *
  * The face-neighbor isometry commutes exactly with aperture-7
  * up-aggregation, so cross-chart label consistency collapses to a
  * pure table constraint per edge (f, e -> g, rotation c): for every
  * res-0 slot S of f whose iso image lands in g's table,
  * TabBc(S) == TabBc(iso0(S)) and TabRot(S) - TabRot(iso0(S)) must be
  * a fixed function of c. This probe reports the observed rot deltas
  * and any base-cell mismatches.
  */
object H3TabDbg {
  def main(args: Array[String]): Unit = H3.probeTableConsistency()
}
