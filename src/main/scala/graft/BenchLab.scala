package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorF

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

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

    // isolate the map-side bucket-assignment scan: interpreted HOF vs
    // native PlaneSignBits, 8- and 16-plane families
    time("bucket_composed_8")(
      emb.select(col("vec_id"),
        VectorF.lshBucketComposed(col("v"), 8, 64).as("b")))
    time("bucket_native_8")(
      emb.select(col("vec_id"),
        VectorF.lshBucket(col("v"), 8, 64).as("b")))
    time("bucket_composed_16")(
      emb.select(col("vec_id"),
        VectorF.lshBucketComposed(col("v"), 16, 64).as("b")))
    time("bucket_native_16")(
      emb.select(col("vec_id"),
        VectorF.lshBucket(col("v"), 16, 64).as("b")))

    // full registered queries riding the swap
    time("x_ann_lsh")(SparkEntry.queries("x_ann_lsh")(spark, sfDir))
    time("x_embed_neardup")(SparkEntry.queries("x_embed_neardup")(spark, sfDir))
    time("x_knn_graph")(SparkEntry.queries("x_knn_graph")(spark, sfDir))
    spark.stop()
  }
}
