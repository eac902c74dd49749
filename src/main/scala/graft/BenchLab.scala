package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch harness for isolating bench regressions (not registered). */
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
    def orders = spark.read.parquet(s"$sfDir/orders.parquet")

    def routeAgg = lineitem
      .groupBy("l_partkey", "l_suppkey")
      .agg(count(lit(1)).as("route_count"))

    def topkFrom(ra: DataFrame): DataFrame = {
      val routes = graft.ops.Ranked.topK(
        ra.select(col("l_partkey").cast("string").as("hex_pickup"),
          col("l_suppkey").cast("string").as("hex_dropoff"),
          col("route_count")),
        "route_count", 100, Seq("hex_pickup", "hex_dropoff"))
        .select(col("hex_pickup").as("route_pickup_hex"),
          col("hex_dropoff").as("route_dropoff_hex"),
          col("route_count"), col("popularity"))
      val dropoffs = graft.ops.Ranked.topK(
        ra.groupBy("l_suppkey").agg(sum("route_count").as("dropoff_count"))
          .select(col("l_suppkey").cast("string").as("top_dropoff_hex"),
            col("dropoff_count")),
        "dropoff_count", 100, Seq("top_dropoff_hex"))
        .select(col("top_dropoff_hex"), col("dropoff_count"),
          col("popularity"))
      val pickups = graft.ops.Ranked.topK(
        ra.groupBy("l_partkey").agg(sum("route_count").as("pickup_count"))
          .select(col("l_partkey").cast("string").as("top_pickup_hex"),
            col("pickup_count")),
        "pickup_count", 100, Seq("top_pickup_hex"))
        .select(col("top_pickup_hex"), col("pickup_count"),
          col("popularity"))
      routes.join(dropoffs, Seq("popularity"), "inner")
        .join(pickups, Seq("popularity"), "inner")
    }

    time("topk_stagereuse")(topkFrom(routeAgg))
    time("topk_persist") {
      val ra = routeAgg.persist(StorageLevel.MEMORY_AND_DISK)
      try topkFrom(ra) finally ()
    }
    time("topk_checkpoint")(topkFrom(routeAgg.localCheckpoint()))

    def a3(li: DataFrame, hint: String): DataFrame = {
      val j = if (hint.isEmpty) li.join(orders,
          col("l_orderkey") === col("o_orderkey"), "inner")
        else li.hint(hint).join(orders.hint(hint),
          col("l_orderkey") === col("o_orderkey"), "inner")
      val tripss = j.select(
        graft.functions.DateTimeF.toDateCol(col("o_orderdate"))
          .as("pickup_date"),
        graft.functions.DateTimeF.timestampDiffMinutes(
          col("l_shipdate"), col("o_orderdate")).as("drive_time"),
        col("l_extendedprice").as("total_amount"))
      val sumAmt = sum(col("total_amount")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2))).cast("double")
      tripss.groupBy(col("pickup_date").cast("string").as("pickup_date"))
        .agg((sum("drive_time").cast("double") / count(lit(1)))
            .as("avg_drive_time"),
          sum("drive_time").as("total_drive_time"),
          (sumAmt / count(lit(1))).as("avg_amount"),
          sumAmt.as("sum_amount"))
    }
    time("a3_smj")(a3(lineitem, ""))
    time("a3_shj")(a3(lineitem, "shuffle_hash"))
    spark.stop()
  }
}
