package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: shingle document-frequency distribution of an sf dir's
  * documents table, bucketed by the Σ df² candidate-pair mass each df
  * band contributes to the inverted-index self-joins. Round-11 finding
  * (PLANS.md): at sf10 max df = 25, so the shipped df cap of 100 never
  * fires there — the containment cost is cold candidate volume, 63% of
  * it from the df∈(10,25] band. Not registered. */
object DfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val s = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.timeType.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val sh = graft.parallelScan(s,
        tbl(s, dir, "documents").select(col("doc_id"), col("text")))
      .select(col("doc_id"), functions.TextF.lowerTokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(array_distinct(
        functions.TextF.shinglesFromTokens(col("toks"), 3))).as("shingle"))
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("dfc"))
    df.select(
      max("dfc").as("max_df"),
      count(lit(1)).as("n_shingles"),
      sum(when(col("dfc") > 100, col("dfc")*col("dfc"))).as("pairs2_gt100"),
      sum(when(col("dfc") > 50 && col("dfc") <= 100, col("dfc")*col("dfc"))).as("pairs2_50_100"),
      sum(when(col("dfc") > 25 && col("dfc") <= 50, col("dfc")*col("dfc"))).as("pairs2_25_50"),
      sum(when(col("dfc") > 10 && col("dfc") <= 25, col("dfc")*col("dfc"))).as("pairs2_10_25"),
      sum(when(col("dfc") > 5 && col("dfc") <= 10, col("dfc")*col("dfc"))).as("pairs2_5_10"),
      sum(when(col("dfc") <= 5, col("dfc")*col("dfc"))).as("pairs2_le5")
    ).show(false)
    s.stop()
  }
}
