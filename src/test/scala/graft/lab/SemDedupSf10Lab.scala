package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev probe (round 16): full-query timing of scaled-K semdedup at
  * sf10 (the argmin-pack + single width-restore plan). */
object SemDedupSf10Lab {
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
    (1 to 3).foreach { p =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("x_semdedup")(spark, "target/sf10")
        .write.format("noop").mode("overwrite").save()
      println(f"[sf10lab] full x_semdedup pass$p ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
