package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic pin for the corpus pipeline's representative-per-fingerprint
  * step (groupBy + min_by rewrite): the driver fixtures carry no
  * duplicate cleaned texts, so the oracle hash-compare never exercises
  * the dedup branch — this spec builds a corpus where it must fire,
  * including the conflicting-metadata case (same cleaned text, different
  * `lang`) that distinguishes min_by from an arbitrary first(). */
class CorpusDedupSpec extends SparkSpec {
  import spark.implicits._

  test("dup fingerprints keep exactly the min-doc_id row with ITS lang") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_corpus_dedup").toString
    Seq(
      // cleans (lower + whitespace collapse) to the same fingerprint:
      (10L, "Hello   World five tokens ok yes", "en"),
      (3L, "hello world five tokens ok yes", "fr"), // min id, lang fr
      (7L, "hello world five tokens ok yes", "de"),
      (20L, "another unique doc with enough tokens here", "en"),
      (30L, "tiny", "en") // 1 token < 5 → dropped after dedup
    ).toDF("doc_id", "text", "lang")
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = graft.SparkEntry.queries("c_corpus_pipeline")(spark, dir)
      .select("lang", "n_docs", "n_tokens_total", "min_doc", "max_doc")
      .as[(String, Long, Long, Long, Long)].collect().toList

    // exactly two survivors: the dup group's min-id row (doc 3, fr) and
    // the unique doc 20 (en); doc 10/7 deduped away, doc 30 length-cut
    assert(out.map(_._2).sum === 2)
    assert(out.map(_._1).toSet === Set("fr", "en"))
    val fr = out.filter(_._1 == "fr")
    assert(fr === List(("fr", 1L, 6L, 3L, 3L)))
    val en = out.filter(_._1 == "en")
    assert(en.map(r => (r._2, r._4, r._5)) === List((1L, 20L, 20L)))
  }
}
