package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic properties of the corpus-curation operators that the oracle
  * hash-compare can't see: the decontamination guarantee itself (no
  * surviving doc shares a shingle with the benchmark slice), fraction
  * ranges, and vocabulary id contiguity. */
class CurateSpec extends SparkSpec {

  test("decontaminate: survivors share ZERO 3-grams with the bench slice") {
    val out = graft.SparkEntry.queries("x_decontaminate")(spark, sf)
      .select("doc_id", "n_hits", "keep").cache()
    // the keep flag is exactly n_hits == 0
    assert(out.filter(col("keep") =!= (col("n_hits") === 0)).count() === 0)
    // re-derive overlap independently for survivors: none may share any
    // distinct 3-shingle with any bench doc
    val docs = graft.tbl(spark, sf, "documents")
      .select(col("doc_id"), graft.functions.TextF.lowerTokens(col("text"))
        .as("toks"))
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.TextF.shinglesFromTokens(col("toks"), 3)))
        .as("shingle"))
    val bench = docs.filter(col("doc_id") % 50 === 7)
      .select("shingle").distinct()
    val survivors = out.filter(col("keep")).select("doc_id")
    val leaked = docs.join(survivors, "doc_id").join(bench, "shingle")
    assert(leaked.count() === 0)
    // bench docs themselves never appear in the output
    assert(out.filter(col("doc_id") % 50 === 7).count() === 0)
    out.unpersist()
  }

  test("repetition filter: fractions in [0,1], keep matches thresholds") {
    val out = graft.SparkEntry.queries("x_repetition_filter")(spark, sf)
      .cache()
    val fracs = Seq("dup_tok_frac", "top_bigram_frac", "dup_trigram_frac")
    for (f <- fracs)
      assert(out.filter(col(f) < 0 || col(f) > 1).count() === 0, f)
    assert(out.filter(col("keep") =!=
      (col("dup_tok_frac") <= 0.6 && col("top_bigram_frac") <= 0.1))
      .count() === 0)
    // the thresholds actually split the fixture (both classes non-empty)
    val kept = out.filter(col("keep")).count()
    assert(kept > 0 && kept < out.count())
    out.unpersist()
  }

  test("vocab build: ids contiguous from 1, frequency non-increasing") {
    val rows = graft.SparkEntry.queries("x_vocab_build")(spark, sf)
      .orderBy("token_id").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getLong(0)).toSeq === (1L to rows.length))
    val tfs = rows.map(_.getLong(2)).toSeq
    assert(tfs === tfs.sorted.reverse)
    // df never exceeds tf and never exceeds the corpus size
    val nDocs = graft.tbl(spark, sf, "documents").count()
    assert(rows.forall(r => r.getLong(3) <= r.getLong(2) &&
      r.getLong(3) <= nDocs))
  }
}
