package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: derive a larger benchmark fixture from a driver-provided sf
  * dir by replicating every fact table `copies`× with CONSISTENT key
  * offsets (each copy's keys shift by copy·(max_key+1), so every
  * FK relationship holds within its copy and never crosses copies).
  * Dimension anchors (`region`, `nation`) stay fixed — zone/nation
  * semantics and group-by cardinalities are preserved while fact volume
  * scales linearly.
  *
  * Document text is token-tagged per copy (copy 0 keeps the original
  * corpus): shingle/minhash collisions then stay within a copy, so
  * near-dup pair density — and with it the cost of the pairs operators —
  * scales linearly like a larger real corpus, instead of quadratically
  * as verbatim duplication would force.
  *
  * Usage: `runMain graft.ScaleGen [srcDir] [outDir] [copies]`
  * (defaults: /root/testdata/sf0.1 → target/sf1 × 10). Used for the
  * PLANS.md sf1 scale measurement; correctness always runs on the
  * driver's own fixtures.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def table(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    /** Replicate with `keys` shifted by cp·(max+1); leaves other columns
      * untouched and preserves column order. */
    def replicate(df: DataFrame, keys: Seq[String],
        extra: (DataFrame, Column) => DataFrame = (d, _) => d): DataFrame = {
      val offs: Map[String, Long] = keys.map { k =>
        k -> (df.agg(max(col(k))).head.getLong(0) + 1L)
      }.toMap
      val cols = df.columns
      val cp = col("graft_cp")
      val rep = df.crossJoin(
          spark.range(copies.toLong).select(col("id").as("graft_cp")))
      val shifted = cols.foldLeft(rep) { (d, c) =>
        if (offs.contains(c)) d.withColumn(c, col(c) + cp * offs(c)) else d
      }
      extra(shifted, cp).select(cols.map(col): _*)
    }

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name -> $out ($copies x)")
    }

    write("region", table("region"))
    write("nation", table("nation"))
    write("customer", replicate(table("customer"), Seq("c_custkey")))
    write("supplier", replicate(table("supplier"), Seq("s_suppkey")))
    write("part", replicate(table("part"), Seq("p_partkey")))
    write("orders",
      replicate(table("orders"), Seq("o_orderkey", "o_custkey")))
    write("lineitem", replicate(table("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey")))
    write("events",
      replicate(table("events"), Seq("event_id", "user_id")))
    write("documents", replicate(table("documents"), Seq("doc_id"),
      extra = (d, cp) => d.withColumn("text",
        when(cp === 0, col("text")).otherwise(
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("w"), cp.cast("string"), lit("x$1")))))))
    write("embeddings", replicate(table("embeddings"), Seq("vec_id")))
    spark.stop()
  }
}
