package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        graft.functions.TextF.lowerTokens(col("text")).as("lt"))

    // In-row term histogram: sort the token array, then run-length the
    // sorted runs via start-index extraction + zip_with against the
    // shifted starts. All higher-order functions, no UDF.
    def termHist(toks: Column): Column = {
      val s = array_sort(toks)
      // greatest-guard: empty array would make sequence(0,-1) descend;
      // the phantom [0] start it produces yields a null term filtered
      // at the end (split() never emits null tokens, so null ⇔ phantom).
      val starts = filter(sequence(lit(0), greatest(size(s) - 1, lit(0))),
        i => (i === lit(0)) || element_at(s, i + 1) =!= element_at(s, i))
      val ends = concat(slice(starts, lit(2), greatest(size(starts) - 1, lit(0))),
        array(size(s)))
      filter(
        zip_with(starts, ends, (st, en) =>
          struct(element_at(s, st + 1).as("term"),
            (coalesce(en, size(s)) - st).as("tf"))),
        h => h("term").isNotNull)
    }

    // variant A: current shape — explode token stream, groupBy (doc, term)
    def tfA = docs.select(col("doc_id"), explode(col("lt")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // variant B: in-row run-length histogram, explode (term, tf) pairs
    def tfB = docs.select(col("doc_id"), explode(termHist(col("lt"))).as("h"))
      .select(col("doc_id"), col("h.term").as("term"), col("h.tf").as("tf"))

    time("tf_explode_agg")(tfA)
    time("tf_inrow_hist")(tfB)

    // sanity: identical (doc_id, term, tf) sets
    val diff = tfA.exceptAll(tfB).count() + tfB.exceptAll(tfA).count()
    println(s"[lab] tfA-vs-tfB diff rows: $diff")

    // full tfidf, both shapes
    val IdfScale = 1000000L
    def full(tf: DataFrame, checkpoint: Boolean): DataFrame = {
      val tfx = if (checkpoint) tf.localCheckpoint() else tf
      val df = tfx.groupBy("term").agg(count(lit(1)).as("df"))
      val n = tfx.select(countDistinct("doc_id").as("n"))
      val rn = row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term")))
      tfx.join(df, "term")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"), col("tf"),
          (col("tf") * expr(s"($IdfScale * (n + 1)) div (df + 1)"))
            .as("score"))
        .withColumn("rn", rn)
        .filter(col("rn") <= 3)
    }
    time("tfidf_A_checkpoint")(full(tfA, checkpoint = true))
    time("tfidf_B_nockpt")(full(tfB, checkpoint = false))
    time("tfidf_B_bcastdf") {
      val df = tfB.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(sum(when(size(col("lt")) > 0, 1L).otherwise(0L))
        .as("n"))
      val rn = row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term")))
      tfB.join(broadcast(df), "term")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"), col("tf"),
          (col("tf") * expr(s"($IdfScale * (n + 1)) div (df + 1)"))
            .as("score"))
        .withColumn("rn", rn)
        .filter(col("rn") <= 3)
    }
    spark.stop()
  }
}
