package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property check: the single-pass scanners in [[TextMaskF]] must equal
  * the `java.util.regex` chain they replace, character for character, on
  * adversarial random strings — this is what licenses swapping them into
  * the oracle-gated queries without touching the oracle SQL. */
class TextMaskSpec extends AnyFunSuite {

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val UrlRe = "https?://[^\\s]+"
  private val emailP = java.util.regex.Pattern.compile(EmailRe)
  private val urlP = java.util.regex.Pattern.compile(UrlRe)

  private def refMask(s: String): String =
    urlP.matcher(emailP.matcher(s).replaceAll("<EMAIL>"))
      .replaceAll("<URL>")

  private def refClean(s: String): String = {
    // Spark trim = strip 0x20 only; then java \s+ → " "
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    java.util.regex.Pattern.compile("\\s+")
      .matcher(s.substring(a, b)).replaceAll(" ")
  }

  // alphabet weighted toward the constructs that matter: '@', dots,
  // dashes, "http", separators, whitespace variants
  private val piece: Gen[String] = Gen.frequency(
    6 -> Gen.oneOf("a", "b", "Z", "1", "9", "xy", "q3"),
    3 -> Gen.oneOf("@", ".", "-", "_", "%", "+"),
    3 -> Gen.oneOf(" ", "\t", "\n", "", "\f", "\r", "  "),
    3 -> Gen.oneOf("http", "https", "://", "http://", "https://", "htt"),
    2 -> Gen.oneOf("@b.com", "a@", ".com", ".c", "co.uk", "@@", "..", "de"),
    1 -> Gen.oneOf("", "<EMAIL>", "/", "?q=1", "#f"))

  private val textGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, piece).map(_.mkString))

  test("mask ≡ java-regex chain on random adversarial strings") {
    val prop = Prop.forAllNoShrink(textGen) { s =>
      val got = TextMaskF.maskUrls(TextMaskF.maskEmails(s))
      val want = refMask(s)
      Prop(got == want) :| s"input=<$s> got=<$got> want=<$want>"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(3000), prop)
    assert(res.passed, res.status.toString)
  }

  test("cleanText ≡ trim+collapse over the masked reference") {
    val prop = Prop.forAllNoShrink(textGen) { s =>
      val got = TextMaskF.cleanText(s)
      val want = refClean(refMask(s))
      Prop(got == want) :| s"input=<$s> got=<$got> want=<$want>"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(3000), prop)
    assert(res.passed, res.status.toString)
  }

  private val PhoneRe =
    "\\+[0-9]{7,15}\\b|\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"
  private val IpRe = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  private val phoneP = java.util.regex.Pattern.compile(PhoneRe)
  private val ipP = java.util.regex.Pattern.compile(IpRe)

  // digit-heavy alphabet: runs of every interesting length, dots and
  // dashes, word/non-word boundary material, the '+' prefix
  private val digitPiece: Gen[String] = Gen.frequency(
    5 -> Gen.oneOf("1", "12", "123", "1234", "55555", "123456789012345",
      "1234567890123456"),
    4 -> Gen.oneOf(".", "-", "+", " ", "", "a", "_", "x9"),
    3 -> Gen.oneOf("555-123-4567", "555.123.4567", "10.0.0.1",
      "192.168.1.100", "+4915112345678", "1.2.3.4", "1.2.3.4567"),
    1 -> Gen.oneOf("..", "--", "+.", "\t", "\n", "call:"))

  private val digitTextGen: Gen[String] =
    Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, digitPiece).map(_.mkString))

  test("maskPhones ≡ java-regex on digit-adversarial strings") {
    val prop = Prop.forAllNoShrink(digitTextGen) { s =>
      val got = TextMaskF.maskPhones(s)
      val want = phoneP.matcher(s).replaceAll("<PHONE>")
      Prop(got == want) :| s"input=<$s> got=<$got> want=<$want>"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(3000), prop)
    assert(res.passed, res.status.toString)
  }

  test("maskIps ≡ java-regex on digit-adversarial strings") {
    val prop = Prop.forAllNoShrink(digitTextGen) { s =>
      val got = TextMaskF.maskIps(s)
      val want = ipP.matcher(s).replaceAll("<IP>")
      Prop(got == want) :| s"input=<$s> got=<$got> want=<$want>"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(3000), prop)
    assert(res.passed, res.status.toString)
  }

  test("cleanTextPii ≡ full regex chain on mixed adversarial strings") {
    val mixedGen: Gen[String] = Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(2 -> piece, 1 -> digitPiece))
        .map(_.mkString))
    val prop = Prop.forAllNoShrink(mixedGen) { s =>
      val got = TextMaskF.cleanTextPii(s)
      val want = refClean(
        ipP.matcher(phoneP.matcher(refMask(s)).replaceAll("<PHONE>"))
          .replaceAll("<IP>"))
      Prop(got == want) :| s"input=<$s> got=<$got> want=<$want>"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(3000), prop)
    assert(res.passed, res.status.toString)
  }

  test("hand vectors: phone/IP edge semantics") {
    // separated NANP and international forms
    assert(TextMaskF.maskPhones("call 555-123-4567 now")
      === "call <PHONE> now")
    assert(TextMaskF.maskPhones("+4915112345678!") === "<PHONE>!")
    // \b guards: digit runs fused into longer runs never match
    assert(TextMaskF.maskPhones("12345-678-9012") === "12345-678-9012")
    assert(TextMaskF.maskPhones("+1234567890123456")
      === "+1234567890123456") // 16 digits: over {7,15}
    assert(TextMaskF.maskPhones("555-123-4567x") === "555-123-4567x")
    // IPv4: octet runs must be maximal 1..3-digit runs
    assert(TextMaskF.maskIps("at 10.0.0.1.") === "at <IP>.")
    assert(TextMaskF.maskIps("1234.5.6.7") === "1234.5.6.7")
    assert(TextMaskF.maskIps("1.2.3.4567") === "1.2.3.4567")
    assert(TextMaskF.maskIps("v1.2.3.4") === "v1.2.3.4") // \b fails
    // order: a dotted phone is consumed before the IP pass ever runs
    assert(TextMaskF.maskIps(TextMaskF.maskPhones("555.123.4567"))
      === "<PHONE>")
  }

  test("hand vectors: the documented edge semantics") {
    // email inside a URL: email pass wins first, URL pass then swallows it
    assert(TextMaskF.maskUrls(TextMaskF.maskEmails(
      "see http://x.com/a@b.com ok")) === "see <URL> ok")
    // TLD is the LAST dot with ≥2 letters (greedy backtracking)
    assert(TextMaskF.maskEmails("a@b.c.de") === "<EMAIL>")
    assert(TextMaskF.maskEmails("a@b.c") === "a@b.c") // 1-letter TLD: no
    // match extends only over letters after the dot
    assert(TextMaskF.maskEmails("a@b.com2") === "<EMAIL>2")
    // failed '@' then a later one that matches, sharing the domain run
    assert(TextMaskF.maskEmails("x@y.z@w.ab") === "x@<EMAIL>")
    // greedy TLD letters swallow the x; the second '@' then has an
    // empty local part (can't reach into the replacement) -> no match
    assert(TextMaskF.maskEmails("a@b.comx@y.de") === "<EMAIL>@y.de")
    // url needs a body
    assert(TextMaskF.maskUrls("http:// x") === "http:// x")
    assert(TextMaskF.maskUrls("https://a http://") === "<URL> http://")
    // collapse: tabs inside stay as single space; only 0x20 trims at ends
    assert(TextMaskF.collapseTrim("  a\t\tb  ") === "a b")
    assert(TextMaskF.collapseTrim("\ta b\n") === " a b ")
  }
}
