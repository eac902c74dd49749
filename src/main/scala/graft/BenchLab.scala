package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

    // the old interpreted-HOF shingle form, kept here for A/B reference
    def hofShingles(toks: Column, k: Int): Column =
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", (0 until k).map(o => toks(i + o)): _*)))
        .otherwise(array().cast("array<string>"))

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), TextF.lowerTokens(col("text")).as("toks"))

    def shOf(mk: Column => Column): DataFrame = docs
      .select(col("doc_id"),
        explode(array_distinct(mk(col("toks")))).as("shingle"))

    time("sh3_hof")(shOf(t => hofShingles(t, 3)))
    time("sh3_codegen")(shOf(t => TextF.shinglesFromTokens(t, 3)))
    spark.stop()
  }
}
