package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(array<string>, k) → array<string>` — contiguous
  * k-token shingles joined with a single space, the n-gram unit behind
  * MinHash/LSH dedup, containment, PMI, and the bigram LM.
  *
  * WHY an Expression: the built-in form
  * (`transform(sequence(0, n-k), i -> concat_ws(" ", toks[i], …))`)
  * routes every shingle through Catalyst's INTERPRETED higher-order
  * machinery — one lambda-variable rebind plus a `concat_ws` eval tree
  * per emitted shingle (the same interpreted-HOF tax the term-histogram
  * expression documents for `array_sort`). This expression is one static
  * JVM call per row: a tight loop of `UTF8String.concatWs` byte copies,
  * inlined into whole-stage codegen, so the shingle stream that feeds a
  * 100 TB dedup pass is produced at scan throughput.
  *
  * Fewer than k tokens → EMPTY array (same guard as the HOF form; no
  * descending-`sequence` trap). NULL array → NULL.
  * Reference scope: no text surface in the reference engine; this backs
  * the training-data-pipeline extension ops.
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle width must be ≥ 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_shingles needs array<string>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WordShingles.compute($c, $k)")

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
  override def prettyName: String = "word_shingles"
}

object WordShingles {
  private val Sep = UTF8String.fromString(" ")

  /** Static helper the generated code calls once per row. */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](n - k + 1)
    if (k == 2) {
      // bigram fast path: skip the window-copy loop
      i = 0
      while (i < n - 1) {
        out(i) = UTF8String.concatWs(Sep, toks(i), toks(i + 1))
        i += 1
      }
    } else {
      val win = new Array[UTF8String](k)
      i = 0
      while (i <= n - k) {
        var j = 0
        while (j < k) { win(j) = toks(i + j); j += 1 }
        out(i) = UTF8String.concatWs(Sep, win: _*)
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}
