package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextF

/** Dev probe (round 16): stage timings of x_lang_id at sf0.1. */
object LangIdLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      (1 to 3).foreach { p =>
        val t0 = System.nanoTime()
        f
        println(f"[lab] $tag pass$p ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val d = graft.tbl(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), trim(lower(col("text"))).as("s"))
    val bigrams = expr(
      """CASE WHEN length(s) < 2 THEN array()
        |ELSE transform(sequence(1, length(s) - 1),
        |               i -> substring(s, i, 2)) END""".stripMargin)
    time("scan only") {
      d.select(col("doc_id"), length(col("s"))).write.format("noop")
        .mode("overwrite").save()
    }
    time("bigram transform only") {
      d.select(col("doc_id"), size(bigrams).as("nb")).write.format("noop")
        .mode("overwrite").save()
    }
    time("bigram histogram") {
      d.select(col("doc_id"),
        size(TextF.termHistogram(bigrams)).as("nh"))
        .write.format("noop").mode("overwrite").save()
    }
    time("histogram exploded") {
      d.select(col("doc_id"), col("lang"),
        explode(TextF.termHistogram(bigrams)).as("hh"))
        .write.format("noop").mode("overwrite").save()
    }
    time("full x_lang_id") {
      graft.SparkEntry.queries("x_lang_id")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
