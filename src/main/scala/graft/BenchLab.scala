package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextF

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

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        TextF.lowerTokens(col("text")).as("toks"))

    // bigram corpus count: exploded-stream aggregate vs in-row histogram
    def biA = docs
      .select(explode(TextF.shinglesFromTokens(col("toks"), 2))
        .as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cab"))
    def biH = docs
      .select(explode(TextF.termHistogram(
        TextF.shinglesFromTokens(col("toks"), 2))).as("h"))
      .groupBy(col("h.term").as("bigram")).agg(sum("h.tf").as("cab"))
    time("bi_explode_agg")(biA)
    time("bi_histogram")(biH)

    // how much do bigrams even repeat in-doc?
    val stats = docs.select(
      size(TextF.shinglesFromTokens(col("toks"), 2)).as("n"),
      size(array_distinct(TextF.shinglesFromTokens(col("toks"), 2)))
        .as("d"))
      .agg(sum("n").as("n"), sum("d").as("d")).collect()(0)
    println(s"[lab] bigram occurrences=${stats.getLong(0)} " +
      s"distinct-per-doc=${stats.getLong(1)}")

    // unigram: same comparison (tokens repeat in-doc much more)
    def uniA = docs.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    def uniH = docs
      .select(explode(TextF.termHistogram(col("toks"))).as("h"))
      .groupBy(col("h.term").as("w")).agg(sum("h.tf").as("cw"))
    time("uni_explode_agg")(uniA)
    time("uni_histogram")(uniH)
    spark.stop()
  }
}
