package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.DirectAgg

/** Scratch harness for isolating bench regressions (not registered).
  * NOTE: never persist() here — CacheManager substitutes matching plan
  * fragments in LATER variants, silently faking their timings. */
object BenchLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(df: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[lab] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    // near-unique-key aggregate: stock partial→final vs DirectCount
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_partkey", "l_suppkey")
    time("route_agg_stock")(
      li.groupBy("l_partkey", "l_suppkey").agg(count(lit(1)).as("n")))
    time("route_agg_direct")(DirectAgg.countByKeys(li, "n"))

    // full queries riding the route aggregate
    time("q_topk_popularity")(
      SparkEntry.queries("q_topk_popularity")(spark, sfDir))
    time("x_containment_pairs")(
      SparkEntry.queries("x_containment_pairs")(spark, sfDir))
    spark.stop()
  }
}
