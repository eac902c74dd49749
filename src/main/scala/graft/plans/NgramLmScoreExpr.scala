package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Trained word-n-gram LM (n-gram → µ-nat log-prob), baked into the scan
  * as a plan reference object (the [[NbLangModel]]/[[BloomMightContain]]
  * pattern) so per-document scoring runs IN-ROW instead of through the
  * exploded join pipeline. Serves both `x_lm_bigram` (width 2) and
  * `x_lm_score` (width 1).
  *
  * Optimization-round rationale (guide §2.3/§2.4): the model is
  * VOCABULARY-bounded (observed word n-grams — Zipf keeps word types to
  * MBs; the row-capped collect falls back loudly to the chain arm past
  * the cap, see `CurateQueries.bigramLmScoreImpl` / `lmScoreImpl`). Once
  * the model exists, a document's score is document-local arithmetic:
  * the chains' corpus-sized materializations, the n-row scoring joins,
  * the per-doc groupBy exchanges and the final doc-keyed left joins all
  * existed only to route n-gram instances past the model — this
  * expression deletes them (the plan becomes: one model aggregate, one
  * scoring scan; the corpus never shuffles). The per-row integer math is
  * EXACTLY each chain's µ-nat law, evaluated with the identical double
  * expression trees on the driver, and the per-doc sum is Long
  * arithmetic (order-free), so the DuckDB oracles hash-gate the
  * restructure unchanged.
  *
  * Keyed by the n-gram's UTF-8 bytes; width ≥ 2 joins adjacent tokens
  * with a single space via the same `UTF8String.concatWs` call as
  * [[WordShingles]], so lookup keys are byte-identical to the exploded
  * stream's shingles (width 1 keys are the raw tokens). */
final class NgramLmModel(
    val keyBytes: Array[Array[Byte]], // distinct observed n-grams (UTF-8)
    val lpq: Array[Long]) // per-n-gram lp_q, µ-nats
    extends Serializable {
  require(keyBytes.length == lpq.length,
    "n-gram LM model arrays are not aligned")

  /** n-gram → lpq index; rebuilt lazily after task deserialization. */
  @transient lazy val index: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](keyBytes.length * 2)
    var i = 0
    while (i < keyBytes.length) {
      m.put(UTF8String.fromBytes(keyBytes(i)), Integer.valueOf(i))
      i += 1
    }
    m
  }
}

/** `ngram_lm_sum(toks) → struct<n_grams, sq>` over a baked
  * [[NgramLmModel]]: walks the token array's contiguous width-`width`
  * windows, summing each window's µ-nat log-prob. Counts only model
  * HITS (the chains' inner scoring-join semantics — on a model trained
  * over the same corpus every instance hits, by construction).
  * NULL/short input yields (0, 0), exactly the chains'
  * missing-perDoc-row case. */
case class NgramLmSum(child: Expression, model: NgramLmModel, width: Int)
    extends UnaryExpression with Serializable {
  require(width >= 1, s"n-gram width must be ≥ 1, got $width")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ngram_lm_sum needs array<string>, got ${other.sql}")
    }

  override def dataType: DataType = NgramLmSum.OutType
  override def nullable: Boolean = false
  override def prettyName: String = "ngram_lm_sum"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    NgramLmSum.compute(
      if (v == null) null else v.asInstanceOf[ArrayData], model, width)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("ngramLmModel", model,
      "graft.plans.NgramLmModel")
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
         |${c.code}
         |org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
         |  graft.plans.NgramLmSum.compute(
         |    ${c.isNull} ? null : ${c.value}, $m, $width);
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): NgramLmSum =
    copy(child = c)
}

object NgramLmSum {
  val OutType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("sq", LongType, nullable = false)))

  private val Sep = UTF8String.fromString(" ")

  /** Static helper the generated code calls once per row. One key build
    * (width 1: the token itself; width 2: one `concatWs`) + one hash
    * probe per window; Long sums are order-free, so the total is
    * bit-equal to the exploded-join form. */
  def compute(arr: ArrayData, m: NgramLmModel, width: Int): InternalRow = {
    var n = 0L
    var sq = 0L
    if (arr != null) {
      val k = arr.numElements()
      if (width == 1) {
        var i = 0
        while (i < k) {
          val idx = m.index.get(arr.getUTF8String(i))
          if (idx != null) {
            sq += m.lpq(idx.intValue())
            n += 1
          }
          i += 1
        }
      } else if (width == 2 && k >= 2) {
        var prev = arr.getUTF8String(0)
        var i = 1
        while (i < k) {
          val cur = arr.getUTF8String(i)
          val idx = m.index.get(UTF8String.concatWs(Sep, prev, cur))
          if (idx != null) {
            sq += m.lpq(idx.intValue())
            n += 1
          }
          prev = cur
          i += 1
        }
      } else if (k >= width) {
        // general window path (mirrors WordShingles' join law)
        val win = new Array[UTF8String](width)
        var i = 0
        while (i <= k - width) {
          var j = 0
          while (j < width) { win(j) = arr.getUTF8String(i + j); j += 1 }
          val idx = m.index.get(UTF8String.concatWs(Sep, win: _*))
          if (idx != null) {
            sq += m.lpq(idx.intValue())
            n += 1
          }
          i += 1
        }
      }
    }
    new GenericInternalRow(Array[Any](n, sq))
  }
}
