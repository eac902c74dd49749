/** graft — a Spark-native (Scala) analytics engine re-expressing the query
  * and data-processing surface of the reference ETL (`/root/reference`,
  * a BigQuery-delegating taxi-trips pipeline; see SURVEY.md) as idiomatic
  * DataFrame/Catalyst plans, plus the large-scale training-data-pipeline
  * operators (dedup, similarity search, text analysis, multimodal columns).
  *
  * Design rules (SURVEY.md §7):
  *  - declarative DataFrame plans; let Catalyst push/prune/reorder
  *  - no driver-side collect except bounded top-k
  *  - every shuffle is authored deliberately (groupBy/join keys chosen so
  *    the plan survives a 100 TB / 1000-executor scale-up)
  */
package object graft {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** Load one of the driver-provided parquet tables from an sf dir. */
  def tbl(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events` with `ts` as TimestampType. The fixture stores TIMESTAMP
    * (NANOS), which Spark only reads with legacy.parquet.nanosAsLong (set
    * in every session builder) — convert epoch-nanos → µs timestamp here.
    * The fixture's values are exactly µs-precision, so this is lossless. */
  def eventsTbl(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val df = tbl(spark, sfDir, "events")
    if (df.schema("ts").dataType == LongType)
      // integer `div`, NOT `/`: epoch-nanos exceed 2^53, so double
      // division would round and drift the value by ±1 µs
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df.withColumn("ts", col("ts").cast("timestamp"))
  }
}
