package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 17): cluster-balance + timing readout for the
  * two-level quantizer at scale — per-vector pair volume Σ|c|²/n is
  * the multiplier on the pair-enumeration stage, so it is the number
  * that decides whether coarse-route imbalance is acceptable. */
object TwoLevelProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf10")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val sizes = ExtQueries.semDedupAssignments(spark, dir, 4096L)
      .groupBy("cluster").count()
      .select(col("count").cast("long")).collect().map(_.getLong(0))
    val n = sizes.sum.toDouble
    val pv = sizes.map(c => c.toDouble * c).sum / n
    println(f"[2lvl] dir=$dir n=${n.toLong} k=${sizes.length} " +
      f"pv=$pv%.1f max=${sizes.max} min=${sizes.min} " +
      f"assign=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
