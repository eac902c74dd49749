package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFSpec extends SparkSpec {
  import spark.implicits._

  test("empty and whitespace-only docs tokenize to an empty array") {
    val r = Seq("", "   ", "a b", " a  b ").toDF("text")
      .select(TextF.tokenCount(col("text"))).as[Int].collect().toSeq
    assert(r === Seq(0, 0, 2, 2))
  }

  test("stopwordRatio/punctRatio are NULL (not NaN/∞) for empty docs") {
    val r = Seq("").toDF("text")
      .select(TextF.stopwordRatio(col("text")),
        TextF.punctRatio(col("text")))
      .as[(Option[Double], Option[Double])].head()
    assert(r === (None, None))
  }

  test("punctRatio counts non-alnum non-space chars") {
    val r = Seq("ab, cd!").toDF("text")
      .select(TextF.punctRatio(col("text"))).as[Double].head()
    assert(r === 2.0 / 7.0)
  }

  test("langId: NULL text → NULL; marker argmax with fixed priority") {
    val r = Seq[(java.lang.Long, String)](
      (1L, null), (2L, "the cat and the dog is here"),
      (3L, "der hund und die katze ist da"),
      (4L, "el perro y la casa es grande"))
      .toDF("id", "text")
      .select(TextF.langId(col("text"))).as[Option[String]].collect().toSeq
    assert(r === Seq(None, Some("en"), Some("de"), Some("es")))
  }

  test("fingerprint is whitespace/case-insensitive content identity") {
    val r = Seq("Hello  World", "hello world", "hello worlds").toDF("text")
      .select(TextF.fingerprint(col("text"))).as[String].collect().toSeq
    assert(r(0) === r(1))
    assert(r(0) !== r(2))
  }

  test("subtokenCount splits on BPE-ish character-class boundaries") {
    val r = Seq("ab1 cd, x!", "", "hello").toDF("text")
      .select(TextF.subtokenCount(col("text"))).as[Int].collect().toSeq
    assert(r === Seq(6, 0, 1)) // ab|1|cd|,|x|!
  }

  test("rollingHash is order-sensitive and bounded by the modulus") {
    val df = Seq("a b c", "c b a", "a b c").toDF("text")
      .select(TextF.lowerTokens(col("text")).as("lt"))
      .select(TextF.rollingHash(col("lt"))).as[Long].collect().toSeq
    assert(df(0) === df(2)) // same sequence → same hash
    assert(df(0) !== df(1)) // permutation → different hash
    assert(df.forall(h => h >= 0 && h < TextF.RollP))
  }

  test("wordShingles: k-gram count and short-doc guard") {
    val df = Seq("a b c d", "a b").toDF("text")
    val r = df.select(size(TextF.wordShingles(col("text"), 3)))
      .as[Int].collect().toSeq
    assert(r === Seq(2, 0)) // "a b c","b c d"; <k tokens → empty
    val first = df.limit(1)
      .select(TextF.wordShingles(col("text"), 3)).as[Seq[String]].head()
    assert(first === Seq("a b c", "b c d"))
  }

  test("wordShingles ≡ the interpreted HOF form on randomized docs") {
    // reference implementation: the transform(sequence)+concat_ws shape
    // the codegen expression replaced
    def hofShingles(toks: org.apache.spark.sql.Column, k: Int) =
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", (0 until k).map(o => toks(i + o)): _*)))
        .otherwise(array().cast("array<string>"))
    val word = org.scalacheck.Gen.oneOf("a", "bb", "ccc", "ü", "x")
    val doc = org.scalacheck.Gen.choose(0, 9).flatMap(n =>
      org.scalacheck.Gen.listOfN(n, word).map(_.mkString(" ")))
    val docs = org.scalacheck.Gen.listOfN(40, doc).sample.get
    for (k <- Seq(1, 2, 3, 5)) {
      val toks = TextF.lowerTokens(col("text"))
      val r = docs.toDF("text")
        .select(TextF.shinglesFromTokens(toks, k).as("a"),
          hofShingles(toks, k).as("b"))
        .as[(Seq[String], Seq[String])].collect()
      r.foreach { case (a, b) => assert(a === b, s"k=$k") }
    }
  }

  test("wordShingles: exact-k doc, k=1 identity, and NULL propagation") {
    val r = Seq("x y z").toDF("text")
      .select(TextF.wordShingles(col("text"), 3)).as[Seq[String]].head()
    assert(r === Seq("x y z"))
    val k1 = Seq("a b a").toDF("text")
      .select(TextF.wordShingles(col("text"), 1)).as[Seq[String]].head()
    assert(k1 === Seq("a", "b", "a"))
    val n = Seq(Option.empty[String]).toDF("text")
      .select(TextF.wordShingles(col("text"), 2).isNull).as[Boolean].head()
    assert(n)
  }
}
