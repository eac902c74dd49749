package graft.queries

import java.nio.file.Files

import graft.{SparkSpec, SparkEntry}

/** Hand-computed BPE training fixture: pins the pair-count weighting by
  * word frequency, the deterministic tie-break, overlapping-pair
  * counting vs non-overlapping greedy application ("aaa" counts (a,a)
  * twice but merges once), and chained merges ((a,b) then (ab,c)). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learned merges match the hand-derived sequence") {
    val dir = Files.createTempDirectory("bpe_fixture").toString
    Seq(
      (1L, "en", "ab ab ab ab ab"), // ab ×5
      (2L, "en", "abc abc abc"),    // abc ×3
      (3L, "en", "aaa")             // aaa ×1
    ).toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // round 1: (a,b) = 5+3 = 8 beats (b,c)=3, (a,a)=2 (overlap counted)
    // round 2: after ab fuses — (ab,c) = 3 beats (a,a) = 2
    // round 3: (a,a) = 2; "aaa" merges greedily to [aa, a], not [aa, aa]
    // round 4: (aa,a) = 1 — exists only because round 3 was greedy
    val got = SparkEntry.queries("x_bpe_merges")(spark, dir)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got === Seq(
      (1, "a", "b", 8L),
      (2, "ab", "c", 3L),
      (3, "a", "a", 2L),
      (4, "aa", "a", 1L)))
  }
}
