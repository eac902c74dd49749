package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ZOrderF

class ZorderSpec extends SparkSpec {

  test("morton2 matches the reference interleave on sample points") {
    import spark.implicits._
    val rows = Seq((3L, 5L), (65535L, 0L), (0L, 65535L), (255L, 256L))
      .toDF("a", "b")
      .select(ZOrderF.morton2(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    def spread(x: Long): Long = {
      var v = x & 0xFFFFL
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      (v | (v << 1)) & 0x55555555L
    }
    val exp = Seq((3L, 5L), (65535L, 0L), (0L, 65535L), (255L, 256L))
      .map { case (a, b) => spread(a) | (spread(b) << 1) }
    assert(rows === exp)
  }

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect {
      case f: FileSourceScanExec => f.metrics("numOutputRows").value
    }
    assert(scans.nonEmpty)
    scans.sum
  }

  test("z-order layout prunes row groups on BOTH dimensions; " +
    "single-column sort only on its own") {
    val base = ScaleQueries.zorderBase(spark, sf) + "/spec_grid"
    val n = 1 << 16 // 256x256 grid of (x, y)
    val grid = spark.range(n).select(
      (col("id") % 256).as("x"),
      floor(col("id") / 256).cast("long").as("y"))
    grid.select(col("x"), col("y"),
        ZOrderF.morton2(col("x"), col("y")).as("zkey"))
      .repartitionByRange(16, col("zkey")).sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(s"$base/z")
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$base/xsort")

    def slice(path: String, dim: String): Long =
      scanRows(spark.read.parquet(path).filter(col(dim) < 32))

    // z-order: a 1/8 slice on EITHER dimension confines the scan to the
    // curve tiles intersecting it (4 of 16 tiles = 1/4 of rows here)
    assert(slice(s"$base/z", "x") <= n / 2, "no x-skip under z-order")
    assert(slice(s"$base/z", "y") <= n / 2, "no y-skip under z-order")
    // x-sorted layout: tight on x …
    assert(slice(s"$base/xsort", "x") <= n / 4)
    // … but every file spans the full y range: zero pruning on y
    assert(slice(s"$base/xsort", "y") === n,
      "x-sorted layout unexpectedly pruned on y")
  }

  test("z-order layout query is layout-invariant vs a plain filter") {
    val viaLayout = graft.SparkEntry.queries("b_zorder_layout")(spark, sf)
      .select("event_type", "cnt").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val plain = graft.eventsTbl(spark, sf)
      .filter(col("user_id").between(100, 299) &&
        col("value") >= 50.0 && col("value") < 150.0)
      .groupBy("event_type").count().orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaLayout === plain)
  }
}
