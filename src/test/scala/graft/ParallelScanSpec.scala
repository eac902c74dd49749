package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Gate behavior of [[graft.parallelScan]] — the row-group-aware
  * repartition that un-bottlenecks heavy per-row compute over
  * legitimately-written but parallelism-hostile parquet (round 10: at
  * sf10 every documents-rooted query ran single-task because a 78 MB
  * single-row-group file is ONE Spark task regardless of cores). */
class ParallelScanSpec extends SparkSpec {
  import spark.implicits._

  private def hasShuffle(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("Repartition")

  test("fires on a big single-row-group file; no-ops below the size gate") {
    val dir = Files.createTempDirectory("pscan").toString
    // ~50 MB of INCOMPRESSIBLE text (per-row hashes — a constant string
    // would dictionary-encode to nothing and duck the size gate) in ONE
    // partition → one file, one row group (inside the 128 MB block)
    val big = spark.range(150000)
      .select(col("id"), expr(
        "concat_ws('', transform(sequence(1, 12), " +
          "i -> md5(cast(id * 1000 + i as string))))").as("text"))
      .coalesce(1)
    big.write.mode("overwrite").parquet(s"$dir/big.parquet")
    val bigScan = spark.read.parquet(s"$dir/big.parquet")
    assert(hasShuffle(parallelScan(spark, bigScan)),
      "40 MB single-row-group scan must be repartitioned")

    // same layout, tiny file → the exchange's stage floor would cost
    // more than the single task's compute → no-op
    val small = spark.range(100)
      .select(col("id"), lit("y" * 40).as("text")).coalesce(1)
    small.write.mode("overwrite").parquet(s"$dir/small.parquet")
    val smallScan = spark.read.parquet(s"$dir/small.parquet")
    assert(!hasShuffle(parallelScan(spark, smallScan)),
      "small scan must not pay an exchange")
  }

  test("no-ops on a many-row-group layout (true splits suffice)") {
    val dir = Files.createTempDirectory("pscan_rg").toString
    // force small row groups: the same 40 MB becomes dozens of true
    // split units, so Spark parallelizes the scan by itself
    spark.range(120000)
      .select(col("id"), lit("z" * 400).as("text"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", (1024 * 1024).toString)
      .parquet(s"$dir/rg.parquet")
    val scan = spark.read.parquet(s"$dir/rg.parquet")
    // sanity: the layout really is multi-row-group
    val meta = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(scan.inputFiles.head),
        spark.sessionState.newHadoopConf()))
    val rgs = try meta.getFooter.getBlocks.size finally meta.close()
    assert(rgs * 2 >= spark.sparkContext.defaultParallelism,
      s"fixture should be many-row-group, got $rgs")
    assert(!hasShuffle(parallelScan(spark, scan)),
      "multi-row-group scan must not pay an extra exchange")
  }

  test("repartitioned frame returns identical rows") {
    val dir = Files.createTempDirectory("pscan_eq").toString
    spark.range(120000)
      .select(col("id"), concat(lit("t"), col("id")).as("text"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val scan = spark.read.parquet(s"$dir/t.parquet")
    val a = scan.orderBy("id").collect().toSeq
    val b = parallelScan(spark, scan).orderBy("id").collect().toSeq
    assert(a === b)
  }
}
