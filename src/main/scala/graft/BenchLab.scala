package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch harness for isolating bench regressions (not registered).
  * NOTE: never persist() here — CacheManager substitutes matching plan
  * fragments in LATER variants, silently faking their timings. */
object BenchLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        println(f"[lab] $label%-24s run$i ${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }

    def lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")

    def routeAgg = lineitem
      .groupBy("l_partkey", "l_suppkey")
      .agg(count(lit(1)).as("route_count"))

    // cost decomposition
    time("routeagg_only")(routeAgg)
    time("routes_topk")(graft.ops.Ranked.topK(
      routeAgg.select(col("l_partkey").cast("string").as("hex_pickup"),
        col("l_suppkey").cast("string").as("hex_dropoff"),
        col("route_count")),
      "route_count", 100, Seq("hex_pickup", "hex_dropoff")))
    time("rollup_direct")(lineitem.groupBy("l_suppkey")
      .agg(count(lit(1)).as("dropoff_count")))

    // full query, direct-rollup variant: rollups aggregate lineitem
    // directly (tiny key cardinality -> map-side combine), routes is the
    // only big aggregate, no checkpoint
    def full: DataFrame = {
      val routes = graft.ops.Ranked.topK(
        routeAgg.select(col("l_partkey").cast("string").as("hex_pickup"),
          col("l_suppkey").cast("string").as("hex_dropoff"),
          col("route_count")),
        "route_count", 100, Seq("hex_pickup", "hex_dropoff"))
        .select(col("hex_pickup").as("route_pickup_hex"),
          col("hex_dropoff").as("route_dropoff_hex"),
          col("route_count"), col("popularity"))
      val dropoffs = graft.ops.Ranked.topK(
        lineitem.groupBy("l_suppkey")
          .agg(count(lit(1)).as("dropoff_count"))
          .select(col("l_suppkey").cast("string").as("top_dropoff_hex"),
            col("dropoff_count")),
        "dropoff_count", 100, Seq("top_dropoff_hex"))
        .select(col("top_dropoff_hex"), col("dropoff_count"),
          col("popularity"))
      val pickups = graft.ops.Ranked.topK(
        lineitem.groupBy("l_partkey")
          .agg(count(lit(1)).as("pickup_count"))
          .select(col("l_partkey").cast("string").as("top_pickup_hex"),
            col("pickup_count")),
        "pickup_count", 100, Seq("top_pickup_hex"))
        .select(col("top_pickup_hex"), col("pickup_count"),
          col("popularity"))
      routes.join(dropoffs, Seq("popularity"), "inner")
        .join(pickups, Seq("popularity"), "inner")
    }
    time("full_direct_rollup")(full)
  }
}
