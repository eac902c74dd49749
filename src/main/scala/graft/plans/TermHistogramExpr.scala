package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `term_histogram(array<string>) → array<struct<term,tf>>` — in-row
  * term-frequency histogram: sort the token array, run-length the equal
  * runs, emit `(term, count)` pairs in ascending binary-UTF8 term order.
  *
  * WHY an Expression and not built-ins: a per-document term count is
  * document-local (every token of a doc lives in one row), yet the
  * `explode → groupBy(doc, term)` shape pushes the whole token stream
  * through a hash aggregate — at sf1 that is ~2.9 s of `x_tfidf_topterms`'
  * 4.4 s. The built-in route (`array_sort` + `filter`/`zip_with`
  * run-length) is NOT viable: Catalyst higher-order functions are
  * interpreted, and `ArraySort`'s lambda comparator evaluates an `If`
  * expression tree per comparison (stack-dump-verified ~100× slowdown).
  * This expression stays in whole-stage codegen — the generated code
  * calls one static JVM helper whose inner loop is
  * `java.util.Arrays.sort` over `UTF8String` (binary compares) plus a
  * single run-length pass, so a 100 TB documents scan keeps one fused
  * loop and the downstream aggregates see per-document DISTINCT terms
  * (weighted by `tf`) instead of every token occurrence.
  *
  * Null array → NULL; null ELEMENTS are dropped (graft's tokenizers never
  * produce them — `TextF.tokens` splits non-null trimmed text).
  * Reference scope: the reference engine has no text surface; this backs
  * the training-data-pipeline extension ops (TF-IDF, BM25, PMI, LM).
  */
case class TermHistogram(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"term_histogram needs array<string>, got ${other.sql}")
    }
  override def dataType: DataType = TermHistogram.OutType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    TermHistogram.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TermHistogram.compute($c)")

  override protected def withNewChildInternal(c: Expression): TermHistogram =
    copy(child = c)
  override def prettyName: String = "term_histogram"
}

object TermHistogram {
  val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  /** Static helper the generated code calls once per row. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { toks(m) = arr.getUTF8String(i); m += 1 }
      i += 1
    }
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    java.util.Arrays.sort(toks.asInstanceOf[Array[Object]], 0, m)
    // count runs, then fill exactly-sized output (no growable buffer)
    var runs = 1
    i = 1
    while (i < m) { if (!toks(i).equals(toks(i - 1))) runs += 1; i += 1 }
    val out = new Array[Any](runs)
    var r = 0
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m && toks(j).equals(toks(i))) j += 1
      // clone: the sorted refs point into the caller's (reusable) row
      // buffer; the histogram must own its term bytes
      out(r) = new GenericInternalRow(
        Array[Any](toks(i).clone(), (j - i).toLong))
      r += 1
      i = j
    }
    new GenericArrayData(out)
  }

  /** Eval-path equivalence helper for specs: histogram as a plain map. */
  def referenceCounts(tokens: Seq[String]): Map[String, Long] =
    tokens.filter(_ != null).groupBy(identity).view.mapValues(_.size.toLong).toMap
}
