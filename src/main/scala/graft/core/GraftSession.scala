package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory (SURVEY.md §7.1 module 1).
  *
  * Reference behavior replaced: the reference creates BigQuery clients and
  * submits remote jobs (`taxi_trips_etl.py:25-26`); here the "engine" is a
  * locally configured SparkSession with scale-appropriate defaults:
  *  - AQE on → runtime shuffle coalescing, broadcast conversion, skew splits
  *  - shuffle.partitions sized to the local core count (a real cluster run
  *    would size this to ~2-3x total cores; AQE coalesces the excess)
  *  - UTC session timezone (BigQuery TIMESTAMP semantics are UTC)
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft",
            extraConf: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", math.max(cores, 8).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.timeType.enabled", "true") // 4.1 TIME feature flag
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.ui.enabled", "false")
    extraConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
