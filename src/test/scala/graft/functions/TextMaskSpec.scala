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

  // -------------------- r18: Luhn-gated card masking ----------------------

  /** Shape extractor: 16 digits, bare or 4×4 with a consistent '-'/' '
    * separator (backreference), `\b` both ends. */
  private val cardP = java.util.regex.Pattern.compile(
    "\\b\\d{4}(?:([ -])\\d{4}\\1\\d{4}\\1\\d{4}|\\d{12})\\b")

  /** Reference for [[TextMaskF.maskCards]]: regex candidate extraction
    * + the same integer checksum, RESUMING AT start+1 on a Luhn
    * failure (a later overlapping start — e.g. groups 2..5 of a
    * five-group run — must get its own shot; plain find() would skip
    * to the failed candidate's end). */
  private def refMaskCards(s: String): String = {
    val m = cardP.matcher(s)
    val out = new java.lang.StringBuilder
    var copied = 0
    var pos = 0
    var go = pos <= s.length && m.find(pos)
    while (go) {
      val st = m.start
      val en = m.end
      val digits = s.substring(st, en).filter(_.isDigit)
        .map(_ - '0').toArray
      if (TextMaskF.luhn16(digits)) {
        out.append(s, copied, st).append("<CARD>")
        copied = en
        pos = en
      } else pos = st + 1
      go = pos <= s.length && m.find(pos)
    }
    if (copied == 0) s else out.append(s, copied, s.length).toString
  }

  // card-adversarial alphabet: valid and off-by-one card bodies, group
  // fragments, both separators, boundary material
  private val cardPiece: Gen[String] = Gen.frequency(
    4 -> Gen.oneOf("4111111111111111", "4111111111111112",
      "4111-1111-1111-1111", "4111 1111 1111 1111",
      "4539578763621486", "4539-5787-6362-1486"),
    4 -> Gen.oneOf("1234", "5678", "9012", "3456", "123", "12345"),
    3 -> Gen.oneOf("-", " ", "", "x", "_", "."),
    1 -> Gen.oneOf("+", "\t", "end", "<CARD>"))

  test("maskCards ≡ regex-extract + Luhn reference on card-adversarial " +
      "strings (including overlapping restart-at-+1 semantics)") {
    val gen: Gen[String] = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, cardPiece).map(_.mkString))
    val prop = Prop.forAllNoShrink(gen) { s =>
      val got = TextMaskF.maskCards(s)
      val want = refMaskCards(s)
      Prop(got == want) :| s"input=<$s> got=<$got> want=<$want>"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(3000), prop)
    assert(res.passed, res.status.toString)
  }

  test("hand vectors: card mask edge semantics") {
    // the three shapes, Luhn-valid (4111111111111111 sums to 30)
    assert(TextMaskF.maskCards("pay 4111111111111111 now")
      === "pay <CARD> now")
    assert(TextMaskF.maskCards("pay 4111-1111-1111-1111 now")
      === "pay <CARD> now")
    assert(TextMaskF.maskCards("pay 4111 1111 1111 1111 now")
      === "pay <CARD> now")
    // Luhn decoy: shape matches, checksum fails, digits stay
    assert(TextMaskF.maskCards("pay 4111111111111112 now")
      === "pay 4111111111111112 now")
    // inconsistent separator: not a card shape
    assert(TextMaskF.maskCards("4111-1111 1111-1111")
      === "4111-1111 1111-1111")
    // \b guards: 15/17-digit runs and word-adjacent runs never match
    assert(TextMaskF.maskCards("411111111111111") === "411111111111111")
    assert(TextMaskF.maskCards("41111111111111112")
      === "41111111111111112")
    assert(TextMaskF.maskCards("x4111111111111111")
      === "x4111111111111111")
    assert(TextMaskF.maskCards("4111-1111-1111-1111x")
      === "4111-1111-1111-1111x")
    // overlapping restart: a 5-group run whose first 4-group window
    // fails Luhn (9998411111111111 sums to 59) but whose SECOND window
    // (groups 2..5 = 4111-1111-1111-1111) passes
    assert(TextMaskF.maskCards("9998-4111-1111-1111-1111")
      === "9998-<CARD>")
    // chain order: the full pii+card clean masks cards before the
    // phone/IP passes see any digits
    assert(TextMaskF.cleanTextPiiCard(
      "  a@b.de 4111 1111 1111 1111  555-123-4567  1.2.3.4 ")
      === "<EMAIL> <CARD> <PHONE> <IP>")
  }
}
