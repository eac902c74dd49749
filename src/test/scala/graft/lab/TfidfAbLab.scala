package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev probe (r18 OPTIMIZATION round): same-window A/B of
  * [[TrainPrepQueries.tfidfTopTermsImpl]]'s two arms — the in-row
  * collected-IDF scorer vs the checkpoint + join + window chain (forced
  * via modelRowCap = 0). Alternating min-of-N so host drift hits both
  * arms equally. Times the RAW frame (no orderBy), matching the benched
  * region (`benchFn = tfidfTopTermsRaw`). */
object TfidfAbLab {
  def main(args: Array[String]): Unit = {
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
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_SAMPLES", "5").toInt
    def run(cap: Long, sf: String): Double = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      TrainPrepQueries.tfidfTopTermsImpl(spark, sf, cap)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both arms
    run(1L << 20, "/root/testdata/sf0.001")
    run(0L, "/root/testdata/sf0.001")
    val inRow = collection.mutable.ArrayBuffer[Double]()
    val chain = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to n) {
      inRow += run(1L << 20, dir)
      chain += run(0L, dir)
    }
    def fmt(xs: Seq[Double]) =
      f"min ${xs.min}%.3f (all: ${xs.map(x => f"$x%.3f").mkString(" ")})"
    println(s"[ab] in-row ${fmt(inRow.toSeq)}")
    println(s"[ab] chain  ${fmt(chain.toSeq)}")
    // plan pair for plans/r18: the chain arm IS the pre-r18 plan
    val out = java.nio.file.Paths.get("target", "plans")
    java.nio.file.Files.createDirectories(out)
    import org.apache.spark.sql.execution.FormattedMode
    java.nio.file.Files.writeString(out.resolve("x_tfidf_topterms_chain.txt"),
      TrainPrepQueries.tfidfTopTermsImpl(spark, dir, 0L)
        .queryExecution.explainString(FormattedMode))
    java.nio.file.Files.writeString(out.resolve("x_tfidf_topterms_inrow.txt"),
      TrainPrepQueries.tfidfTopTermsImpl(spark, dir, 1L << 20)
        .queryExecution.explainString(FormattedMode))
    spark.stop()
  }
}
