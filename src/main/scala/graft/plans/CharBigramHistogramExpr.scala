package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `char_bigram_histogram(string) → array<struct<term,tf>>` — in-row
  * histogram of a string's character bigrams (code-point pairs,
  * 1-based window i covering chars i, i+1 — exactly the pairs
  * `transform(sequence(1, length(s)-1), i -> substring(s, i, 2))`
  * produces), `(term, count)` in ascending binary-UTF8 term order.
  *
  * WHY an Expression (the [[TermHistogram]] rationale, one level
  * lower): the composed form pays an interpreted lambda + a fresh
  * UTF8String allocation per CHARACTER of the corpus — measured 1.6 s
  * for the transform alone on the sf0.1 documents scan vs 0.15 s for
  * the bare scan, which made `x_lang_id` the slowest sf0.1 bench entry.
  * This expression stays in whole-stage codegen: one static helper walks
  * the UTF-8 bytes once (code-point starts), sorts bigram slices with
  * binary compares, run-lengths — no per-element expression evaluation,
  * no intermediate bigram array. Downstream, the LID model/scoring
  * aggregates see per-document DISTINCT bigrams weighted by `tf`.
  *
  * Cross-engine note: code-point indexing matches Spark `substring` and
  * DuckDB's `s[i:i+1]` slicing for the BMP; the oracle operates on the
  * raw-bigram relation (same aggregate), so equality is checked at the
  * model level by the driver gate. Null string → NULL. */
case class CharBigramHistogram(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_bigram_histogram needs string, got ${other.sql}")
    }
  override def dataType: DataType = TermHistogram.OutType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    CharBigramHistogram.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.CharBigramHistogram.compute($c)")

  override protected def withNewChildInternal(
      c: Expression): CharBigramHistogram = copy(child = c)
  override def prettyName: String = "char_bigram_histogram"
}

object CharBigramHistogram {

  /** UTF-8 sequence length from its first byte (continuation/invalid
    * bytes advance by 1 — same forgiving walk UTF8String uses). */
  @inline private def seqLen(b: Byte): Int =
    if (b >= 0) 1
    else if ((b & 0xE0) == 0xC0) 2
    else if ((b & 0xF0) == 0xE0) 3
    else if ((b & 0xF8) == 0xF0) 4
    else 1

  /** Static helper the generated code calls once per row. */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes // may alias the row buffer: clone at emit
    val n = bytes.length
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    // code-point start offsets (starts(numChars) == n sentinel)
    var chars = 0
    var o = 0
    while (o < n) { chars += 1; o += seqLen(bytes(o)) }
    if (chars < 2) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](chars + 1)
    var idx = 0
    o = 0
    while (o < n) { starts(idx) = o; idx += 1; o += seqLen(bytes(o)) }
    starts(chars) = n
    val m = chars - 1
    val grams = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      grams(i) = UTF8String.fromBytes(
        bytes, starts(i), starts(i + 2) - starts(i))
      i += 1
    }
    java.util.Arrays.sort(grams.asInstanceOf[Array[Object]], 0, m)
    var runs = 1
    i = 1
    while (i < m) { if (!grams(i).equals(grams(i - 1))) runs += 1; i += 1 }
    val out = new Array[Any](runs)
    var r = 0
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m && grams(j).equals(grams(i))) j += 1
      out(r) = new GenericInternalRow(
        Array[Any](grams(i).clone(), (j - i).toLong))
      r += 1
      i = j
    }
    new GenericArrayData(out)
  }

  /** Eval-path equivalence helper for specs. */
  def referenceCounts(s: String): Map[String, Long] = {
    val cps = s.codePoints().toArray
    (0 until cps.length - 1)
      .map(i => new String(cps, i, 2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  }
}

/** `char_bigrams(string) → array<string>` — the RAW code-point bigram
  * instance list, in document order, no histogram.
  *
  * OPTIMIZATION r18 (guide §1.2 "per-task work"): x_lang_id's MODEL
  * aggregate `groupBy(lang, bg)` counts instances either way, so the
  * per-doc `Arrays.sort` the histogram pays to pre-collapse them buys
  * nothing the hash aggregate's map-side combine doesn't already do —
  * and that sort was the scan's hottest loop (the histogram's collapse
  * pays off only when the EXCHANGED stream shrinks, which a partial
  * aggregate on (lang, bg) already guarantees). Same forgiving UTF-8
  * walk as [[CharBigramHistogram]], so instance sets are identical;
  * `CharBigramHistogramSpec` pins sorted+run-length(char_bigrams) ==
  * char_bigram_histogram. */
case class CharBigrams(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_bigrams needs string, got ${other.sql}")
    }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    CharBigrams.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharBigrams.compute($c)")

  override protected def withNewChildInternal(c: Expression): CharBigrams =
    copy(child = c)
  override def prettyName: String = "char_bigrams"
}

object CharBigrams {
  @inline private def seqLen(b: Byte): Int =
    if (b >= 0) 1
    else if ((b & 0xE0) == 0xC0) 2
    else if ((b & 0xF0) == 0xE0) 3
    else if ((b & 0xF8) == 0xF0) 4
    else 1

  /** Static helper the generated code calls once per row. */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes // may alias the row buffer: clone at emit
    val n = bytes.length
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    var chars = 0
    var o = 0
    while (o < n) { chars += 1; o += seqLen(bytes(o)) }
    if (chars < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](chars - 1)
    var p0 = 0
    var p1 = seqLen(bytes(0))
    var i = 0
    while (p1 < n) {
      val p2 = p1 + seqLen(bytes(p1))
      // copy: the slice must own its bytes once it leaves this row
      out(i) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, p0, p2))
      i += 1
      p0 = p1
      p1 = p2
    }
    new GenericArrayData(out)
  }
}
