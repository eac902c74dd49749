package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.functions.TextF

/** Semantic guarantees of the codegen term-histogram expression: the
  * exploded histogram must be row-for-row equal to the classic
  * `explode(tokens) → groupBy(doc, term) → count` aggregate it replaces
  * (that equivalence is exactly why swapping it into TF-IDF/BM25/PMI/LM
  * can't change any oracle result). */
class TermHistogramSpec extends SparkSpec {
  import spark.implicits._

  private def histRows(docs: Seq[(Long, String)]): Set[(Long, String, Long)] =
    docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(TextF.termHistogram(TextF.lowerTokens(col("text"))))
          .as("h"))
      .select(col("doc_id"), col("h.term"), col("h.tf"))
      .as[(Long, String, Long)].collect().toSet

  private def aggRows(docs: Seq[(Long, String)]): Set[(Long, String, Long)] =
    docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(TextF.lowerTokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .as[(Long, String, Long)].collect().toSet

  test("histogram ≡ explode+groupBy on randomized token soup") {
    val word = Gen.oneOf("a", "b", "ab", "the", "x1", "ü", "longerword")
    val doc = Gen.listOfN(30, word).map(_.mkString(" "))
    val docsGen = Gen.listOfN(25, doc)
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    val docs = docsGen.sample.get
    assert(histRows(docs) === aggRows(docs))
  }

  test("empty, whitespace-only, and single-token docs") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "solo"), (4L, "a a a"))
    assert(histRows(docs) ===
      Set((3L, "solo", 1L), (4L, "a", 3L)))
  }

  test("NULL array → NULL histogram (not a crash, not an empty array)") {
    val r = Seq((1L, Option.empty[String]))
      .toDF("doc_id", "text")
      .select(TextF.termHistogram(TextF.tokens(col("text"))).isNull)
      .as[Boolean].head()
    assert(r)
  }

  test("terms emerge in ascending binary order with owned bytes") {
    val r = Seq((1L, "b c a b a"))
      .toDF("doc_id", "text")
      .select(explode(TextF.termHistogram(
        TextF.lowerTokens(col("text")))).as("h"))
      .select(col("h.term"), col("h.tf"))
      .as[(String, Long)].collect().toSeq
    assert(r === Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }

  test("bigram histogram composes with shinglesFromTokens") {
    val docs = Seq((1L, "x y x y x"))
    val r = docs.toDF("doc_id", "text")
      .select(explode(TextF.termHistogram(TextF.shinglesFromTokens(
        TextF.lowerTokens(col("text")), 2))).as("h"))
      .select(col("h.term"), col("h.tf"))
      .as[(String, Long)].collect().toSet
    assert(r === Set(("x y", 2L), ("y x", 2L)))
  }
}
