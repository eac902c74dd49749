package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev probe (r18 OPTIMIZATION round): same-window A/Bs of the
  * collected-model arms of x_decontaminate, x_lm_score and
  * x_bm25_topterms vs their join-chain arms (forced via cap = 0); also
  * writes each one's chain/in-row plan pair to target/plans. (The
  * x_pmi_bigrams arm this lab originally measured was REJECTED on its
  * numbers and removed — see OPTIMIZATION_r18.md.) Alternating
  * min-of-N so host drift hits both arms equally; times the benched
  * frames. */
object InRowAbLab {
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
    def time(f: => DataFrame): Double = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val surfaces: Seq[(String, Long => DataFrame)] = Seq(
      "x_decontaminate" ->
        ((cap: Long) => CurateQueries.decontaminateImpl(spark, dir, cap)),
      "x_lm_score" ->
        ((cap: Long) => CurateQueries.lmScoreImpl(spark, dir, cap)),
      "x_bm25_topterms" ->
        ((cap: Long) => TrainPrepQueries.bm25TopTermsImpl(spark, dir, cap)))
    for ((name, mk) <- surfaces) {
      // warm both arms at the smallest SF
      def small(cap: Long) = name match {
        case "x_lm_score" => CurateQueries.lmScoreImpl(
          spark, "/root/testdata/sf0.001", cap)
        case "x_bm25_topterms" => TrainPrepQueries.bm25TopTermsImpl(
          spark, "/root/testdata/sf0.001", cap)
        case _ => CurateQueries.decontaminateImpl(
          spark, "/root/testdata/sf0.001", cap)
      }
      time(small(1L << 20)); time(small(0L))
      val inRow = collection.mutable.ArrayBuffer[Double]()
      val chain = collection.mutable.ArrayBuffer[Double]()
      for (_ <- 1 to n) {
        inRow += time(mk(1L << 20))
        chain += time(mk(0L))
      }
      def fmt(xs: Seq[Double]) =
        f"min ${xs.min}%.3f (all: ${xs.map(x => f"$x%.3f").mkString(" ")})"
      println(s"[ab] $name in-row ${fmt(inRow.toSeq)}")
      println(s"[ab] $name chain  ${fmt(chain.toSeq)}")
      val out = java.nio.file.Paths.get("target", "plans")
      java.nio.file.Files.createDirectories(out)
      import org.apache.spark.sql.execution.FormattedMode
      java.nio.file.Files.writeString(out.resolve(s"${name}_chain.txt"),
        mk(0L).queryExecution.explainString(FormattedMode))
      java.nio.file.Files.writeString(out.resolve(s"${name}_inrow.txt"),
        mk(1L << 20).queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
