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

    val PmiMinCount = 3
    val PmiTopN = 50

    def docsRaw = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), TextF.lowerTokens(col("text")).as("toks"))

    def pmi(toksDf: DataFrame): DataFrame = {
      val uni = toksDf
        .select(explode(TextF.termHistogram(col("toks"))).as("h"))
        .groupBy(col("h.term").as("w")).agg(sum("h.tf").as("cw"))
      val bi = toksDf
        .select(explode(TextF.shinglesFromTokens(col("toks"), 2))
          .as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("cab"))
        .filter(col("cab") >= PmiMinCount)
      val n = toksDf.agg(sum(size(col("toks"))).as("n"))
      bi.withColumn("w1", split(col("bigram"), " ").getItem(0))
        .withColumn("w2", split(col("bigram"), " ").getItem(1))
        .join(uni.withColumnsRenamed(Map("w" -> "w1", "cw" -> "c1")), "w1")
        .join(uni.withColumnsRenamed(Map("w" -> "w2", "cw" -> "c2")), "w2")
        .crossJoin(broadcast(n))
        .select(col("bigram"), col("cab"),
          expr("(cab * n * 1000000) div (c1 * c2)").as("ratio_ppm"))
        .orderBy(col("ratio_ppm").desc, col("bigram"))
        .limit(PmiTopN)
    }

    time("pmi_retokenize")(pmi(docsRaw))
    time("pmi_toks_ckpt")(pmi(docsRaw.localCheckpoint()))
    spark.stop()
  }
}
