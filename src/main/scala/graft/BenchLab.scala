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

    val K = 3
    val MaxShingleDf = 100

    def sh = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), TextF.lowerTokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(array_distinct(
        TextF.shinglesFromTokens(col("toks"), K))).as("shingle"))
      .localCheckpoint()

    val shC = sh
    val hot = shC.groupBy("shingle").agg(count(lit(1)).as("dfc"))
      .filter(col("dfc") > MaxShingleDf).select("shingle")
      .localCheckpoint()
    val cold = shC.join(broadcast(hot), Seq("shingle"), "left_anti")

    println(s"[lab] sh rows: ${shC.count()}")
    val a = cold.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = cold.select(col("doc_id").as("doc_b"), col("shingle"))
    val coocc = a.join(b, Seq("shingle"))
      .filter(col("doc_a") =!= col("doc_b"))
    println(s"[lab] co-occurrence rows: ${coocc.count()}")
    val pairs = coocc.groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    println(s"[lab] distinct pairs: ${pairs.count()}")

    time("selfjoin_only")(coocc)
    time("selfjoin_groupby")(pairs)
    spark.stop()
  }
}
