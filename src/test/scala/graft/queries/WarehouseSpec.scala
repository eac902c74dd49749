package graft.queries

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class WarehouseSpec extends SparkSpec {

  test("partitioned sink read prunes to one day's partition") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val df = graft.SparkEntry.queries("s_partitioned_sink")(s, sf)
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"date predicate must become a PartitionFilter:\n$scan")
    // pruning happens at planning-time partition selection; after
    // execution the scan's numFiles metric must count ONLY the selected
    // day's files (inputFiles would list the whole relation)
    df.collect()
    val base = new java.io.File(WarehouseQueries.psinkBase(s, sf))
    def parquets(d: java.io.File): Int =
      Option(d.listFiles()).toSeq.flatten.count(_.getName.endsWith(".parquet"))
    val dayFiles = parquets(new java.io.File(base, "ds=2024-01-05"))
    val allFiles = Option(base.listFiles()).toSeq.flatten
      .filter(_.isDirectory).map(parquets).sum
    assert(dayFiles > 0 && allFiles > dayFiles)
    assert(scan.metrics("numFiles").value === dayFiles,
      s"scan read ${scan.metrics("numFiles").value} files, " +
        s"expected only the $dayFiles in ds=2024-01-05 (of $allFiles)")
  }

  test("KMV estimate is within 40% of exact distinct at k=16") {
    val rows = graft.SparkEntry.queries("w_kmv_distinct")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_distinct")
      val exact = r.getAs[Long]("n_distinct").toDouble
      assert(est > 0 && math.abs(est - exact) / exact <= 0.4,
        s"KMV estimate $est too far from exact $exact " +
          s"(k=16 → σ≈25%; 40% is the generous test bound)")
    }
  }

  test("KMV Aggregator agrees with the window/rank formulation") {
    val viaAgg = graft.SparkEntry.queries("w_kmv_aggregator")(spark, sf)
      .collect().toSeq
    val viaWindow = graft.SparkEntry.queries("w_kmv_distinct")(spark, sf)
      .collect().toSeq
    assert(viaAgg.nonEmpty && viaAgg === viaWindow)
  }

  test("KMV Aggregator reduce/merge keep the k smallest distinct") {
    val agg = new graft.functions.KmvAggregator(4)
    val buf = Seq(50L, 10L, 30L, 10L, 70L, 20L, 5L)
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf.toSeq === Seq(5L, 10L, 20L, 30L)) // sorted, distinct, k=4
    val merged = agg.merge(buf, Array(1L, 10L, 25L, 90L))
    assert(merged.toSeq === Seq(1L, 5L, 10L, 20L))
    assert(agg.finish(Array(1L, 2L)) === 2.0) // below k → exact count
  }

  test("compaction rewrites 64 small files into at most 4") {
    val s = spark.newSession()
    graft.SparkEntry.queries("s_compact")(s, sf).collect()
    val base = WarehouseQueries.compactBase(s, sf)
    def nParquet(p: String) =
      Option(new java.io.File(base, p).listFiles()).toSeq.flatten
        .count(_.getName.endsWith(".parquet"))
    assert(nParquet("small") === 64)
    assert(nParquet("compacted") <= 4 && nParquet("compacted") > 0)
  }

  test("upsert applies updates, drops deletes, adds inserts") {
    val snap = graft.tbl(spark, sf, "orders")
    val out = graft.SparkEntry.queries("w_upsert")(spark, sf)
    val nSnap = snap.count()
    val nUpd = snap.filter(col("o_orderkey") % 10 === 0).count()
    val nDel = snap.filter(col("o_orderkey") % 10 === 1).count()
    val nIns = snap.filter(col("o_orderkey") % 10 === 2).count()
    assert(out.count() === nSnap - nDel + nIns)
    // updates rewrote status in place
    assert(out.filter(col("o_orderkey") % 10 === 0 &&
      col("o_orderkey") < 10000000L && col("o_orderstatus") === "X")
      .count() === nUpd)
    // inserts landed under shifted keys
    assert(out.filter(col("o_orderkey") >= 10000000L).count() === nIns)
    // untouched rows are byte-identical to the snapshot
    val untouched = out.filter(col("o_orderkey") % 10 > 2)
    val orig = snap.filter(col("o_orderkey") % 10 > 2)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    assert(untouched.exceptAll(orig).isEmpty &&
      orig.exceptAll(untouched).isEmpty)
  }
}
