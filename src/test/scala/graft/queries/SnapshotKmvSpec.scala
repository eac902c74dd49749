package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic guarantees of the manifest-pinned snapshot scan and the KMV
  * sketch merge that the DuckDB oracle compare cannot itself witness:
  * isolation against the concurrent append (the oracle only checks the
  * final answer, not that MORE data was there to ignore) and the merge
  * theorem holding as an equality INSIDE the engine.
  */
class SnapshotKmvSpec extends SparkSpec {

  test("manifest-pinned scan ignores the concurrent append") {
    val pinned = graft.SparkEntry.queries("s_manifest_snapshot")(spark, sf)
      .agg(sum("cnt")).head().getLong(0)
    // the unpinned directory listing sees v1 + the append = every event
    val dirRows =
      spark.read.parquet(IngestQueries.manifestEventsDataDir).count()
    val allRows = graft.eventsTbl(spark, sf).count()
    assert(dirRows === allRows,
      s"directory read must see the append: $dirRows vs $allRows")
    assert(pinned < dirRows, "pinned read must not see the append")
    val oddRows = graft.eventsTbl(spark, sf)
      .filter(col("event_id") % 2 === 1).count()
    assert(pinned === oddRows,
      s"pinned read must equal the v1 commit: $pinned vs $oddRows")
  }

  test("KMV merge of per-type partials equals the raw-data sketch") {
    val row = graft.SparkEntry.queries("w_kmv_union")(spark, sf).head()
    val (merged, raw) = (row.getDouble(0), row.getDouble(1))
    assert(merged === raw,
      s"superset theorem: merged estimate $merged must equal raw $raw")
    val exact = row.getLong(2).toDouble
    assert(math.abs(merged - exact) / exact < 0.4,
      s"k=16 estimate $merged implausibly far from exact $exact")
  }
}
