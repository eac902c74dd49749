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
    try run(spark, src, out, copies)
    finally spark.stop()
  }

  /** Session-borrowing form (specs call this — the caller owns the
    * session lifecycle). */
  def run(spark: SparkSession, src: String, out: String,
      copies: Int): Unit = {
    def table(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    /** Key stride for a replicated id space: one past the PARENT
      * table's max. FKs must use the parent PK's stride, not their own
      * column max — a parent key absent from the child (e.g. a customer
      * with no orders holding the top custkey) would otherwise give the
      * child a smaller stride and silently mis-join copies. Cast guards
      * INT32-typed fixture keys. */
    def stride(tableName: String, k: String): Long =
      table(tableName).agg(max(col(k).cast("long"))).head.getLong(0) + 1L

    /** Replicate with each key column shifted by cp·stride; leaves other
      * columns untouched and preserves column order. */
    def replicate(df: DataFrame, offs: Map[String, Long],
        extra: (DataFrame, Column) => DataFrame = (d, _) => d): DataFrame = {
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

    // FK columns take the PARENT PK's stride so copies stay join-closed
    val custS = stride("customer", "c_custkey")
    val suppS = stride("supplier", "s_suppkey")
    val partS = stride("part", "p_partkey")
    val ordS = stride("orders", "o_orderkey")
    write("region", table("region"))
    write("nation", table("nation"))
    write("customer", replicate(table("customer"),
      Map("c_custkey" -> custS)))
    write("supplier", replicate(table("supplier"),
      Map("s_suppkey" -> suppS)))
    write("part", replicate(table("part"), Map("p_partkey" -> partS)))
    write("orders", replicate(table("orders"),
      Map("o_orderkey" -> ordS, "o_custkey" -> custS)))
    write("lineitem", replicate(table("lineitem"),
      Map("l_orderkey" -> ordS, "l_partkey" -> partS,
        "l_suppkey" -> suppS)))
    write("events", replicate(table("events"),
      Map("event_id" -> stride("events", "event_id"),
        "user_id" -> stride("events", "user_id"))))
    write("documents", replicate(table("documents"),
      Map("doc_id" -> stride("documents", "doc_id")),
      extra = (d, cp) => d.withColumn("text",
        when(cp === 0, col("text")).otherwise(
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("w"), cp.cast("string"), lit("x$1")))))))
    // Embeddings get the vector analog of the documents' token tagging
    // (round 14: verbatim copies made EVERY cross-copy pair a perfect
    // near-duplicate, so x_embed_neardup's candidate volume grew as
    // copies² — 135 s at sf1 in BOTH engines): each copy applies a
    // SIGNED CIRCULAR SHIFT — rotate by cp mod dim, flip signs where
    // xxhash64(cp, i) is odd. A signed permutation is orthogonal, so
    // all WITHIN-copy cosines are preserved bit-exactly (the workload
    // per copy is the real one), while cross-copy cosines collapse to
    // noise — near-dup density scales linearly like a real corpus.
    // Copy 0 keeps the original vectors.
    write("embeddings", replicate(table("embeddings"),
      Map("vec_id" -> stride("embeddings", "vec_id")),
      extra = (d, cp) => d.withColumn("embedding",
        when(cp === 0, col("embedding")).otherwise(expr(
          """transform(sequence(0, size(embedding) - 1), i ->
            |  element_at(embedding,
            |    CAST(pmod(i + graft_cp, size(embedding)) AS INT) + 1) *
            |  CASE WHEN pmod(xxhash64(graft_cp, i), 2) = 0
            |       THEN CAST(1.0 AS FLOAT)
            |       ELSE CAST(-1.0 AS FLOAT) END)""".stripMargin)))))
  }
}
