package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Arm-equality pin for the r18 collected-model optimization of
  * `x_decontaminate` (in-row probe of the collected benchmark shingle
  * set): must equal the join-chain arm row-for-row, degenerate docs
  * included. (The analogous x_pmi_bigrams rewrite was A/B'd and
  * REJECTED — see the note on `CurateQueries.pmiBigrams`.) */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_decont").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // doc_id 7 and 57 are the benchmark slice (id % 50 == 7); 10 shares a
  // 3-gram with 7, 11 shares none, 12 is too short for any 3-gram
  private val docs: Seq[(Long, String)] = Seq(
    (7L, "alpha beta gamma delta epsilon zeta"),
    (57L, "eta theta iota kappa lambda mu"),
    (10L, "prefix words then alpha beta gamma and more text"),
    (11L, "completely disjoint vocabulary in this training document"),
    (12L, "two words"),
    (13L, "eta theta iota appears here too with kappa lambda mu"))

  test("in-row set-probe arm equals the join-chain arm row-for-row " +
      "(contaminated, clean and short docs)") {
    val dir = corpus(docs)
    val inRow = CurateQueries.decontaminateImpl(spark, dir, 1L << 20)
      .orderBy("doc_id").collect().toSeq
    // setRowCap = 0 forces the over-cap chain arm
    val chain = CurateQueries.decontaminateImpl(spark, dir, 0L)
      .orderBy("doc_id").collect().toSeq
    assert(inRow === chain)
    // the benchmark slice is excluded; hits land where expected
    assert(inRow.map(_.getLong(0)) === Seq(10L, 11L, 12L, 13L))
    val byId = inRow.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(10L) > 0 && byId(13L) > 0)
    assert(byId(11L) === 0 && byId(12L) === 0)
    assert(inRow.forall(r => r.getBoolean(2) === (r.getLong(1) == 0L)))
  }
}
