package graft.queries

import graft.SparkSpec

/** File-level skipping the oracle compare cannot witness: the
  * manifest-stats reader must select a strict subset of the
  * range-clustered files (the oracle only checks the final answer). */
class ManifestPruneSpec extends SparkSpec {

  test("manifest stats prune selects a strict subset of files") {
    val (df, (selected, total)) =
      IngestQueries.manifestPruneWithCounts(spark, sf)
    df.collect()
    assert(total >= 8, s"range write should produce >= 8 files, got $total")
    assert(selected > 0 && selected < total,
      s"top-quarter predicate must prune files: $selected of $total read")
    assert(selected <= total / 2,
      s"a quarter of the id range should need <= half the files " +
        s"($selected of $total)")
  }
}
