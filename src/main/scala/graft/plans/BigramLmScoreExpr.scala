package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Trained word-bigram LM (bigram → µ-nat log-prob), baked into the scan
  * as a plan reference object (the [[NbLangModel]]/[[BloomMightContain]]
  * pattern) so per-document scoring runs IN-ROW instead of through the
  * exploded-bigram join pipeline.
  *
  * Optimization-round rationale (guide §2.3/§2.4): the model is
  * VOCABULARY-bounded (observed word bigrams — Zipf keeps word types to
  * MBs; the row-capped collect falls back loudly to the chain arm past
  * the cap, see `CurateQueries.bigramLmScoreImpl`). Once the model
  * exists, a document's score is document-local arithmetic: the chain's
  * corpus-sized exploded-bigram localCheckpoint (write + two reads), the
  * n-row scoring join, the per-doc groupBy exchange and the final
  * doc-keyed left join all existed only to route bigram instances past
  * the model — this expression deletes them (the plan becomes: one model
  * aggregate, one tiny v aggregate, one scoring scan; the corpus never
  * shuffles). The per-row integer math is EXACTLY the chain's µ-nat law
  * — lp_q = floor(ln((c_ab+1)/(c_w1+V))·10⁶) per observed bigram,
  * evaluated with the identical double expression tree on the driver —
  * and the per-doc sum is Long arithmetic, so the DuckDB oracle
  * hash-gates the restructure unchanged.
  *
  * Keyed by the bigram's UTF-8 bytes; the scorer joins adjacent tokens
  * with a single space via the same `UTF8String.concatWs` call as
  * [[WordShingles]], so lookup keys are byte-identical to the exploded
  * stream's shingles. */
final class BigramLmModel(
    val bgBytes: Array[Array[Byte]], // distinct observed bigrams (UTF-8)
    val lpq: Array[Long]) // per-bigram lp_q, µ-nats
    extends Serializable {
  require(bgBytes.length == lpq.length,
    "bigram LM model arrays are not aligned")

  /** bigram → lpq index; rebuilt lazily after task deserialization. */
  @transient lazy val index: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](bgBytes.length * 2)
    var i = 0
    while (i < bgBytes.length) {
      m.put(UTF8String.fromBytes(bgBytes(i)), Integer.valueOf(i))
      i += 1
    }
    m
  }
}

/** `bigram_lm_sum(toks) → struct<n_bigrams, sq>` over a baked
  * [[BigramLmModel]]: walks the token array's adjacent pairs, summing
  * each pair's µ-nat log-prob. Counts only model HITS (the chain's inner
  * scoring join semantics — on a model trained over the same corpus
  * every instance hits, by construction). NULL/short input yields
  * (0, 0), exactly the chain's missing-perDoc-row case. */
case class BigramLmSum(child: Expression, model: BigramLmModel)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bigram_lm_sum needs array<string>, got ${other.sql}")
    }

  override def dataType: DataType = BigramLmSum.OutType
  override def nullable: Boolean = false
  override def prettyName: String = "bigram_lm_sum"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    BigramLmSum.compute(
      if (v == null) null else v.asInstanceOf[ArrayData], model)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bgLmModel", model,
      "graft.plans.BigramLmModel")
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
         |${c.code}
         |org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
         |  graft.plans.BigramLmSum.compute(
         |    ${c.isNull} ? null : ${c.value}, $m);
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): BigramLmSum =
    copy(child = c)
}

object BigramLmSum {
  val OutType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("sq", LongType, nullable = false)))

  private val Sep = UTF8String.fromString(" ")

  /** Static helper the generated code calls once per row. One
    * `concatWs` + one hash probe per adjacent token pair; Long sums are
    * order-free, so the total is bit-equal to the exploded-join form. */
  def compute(arr: ArrayData, m: BigramLmModel): InternalRow = {
    var n = 0L
    var sq = 0L
    if (arr != null) {
      val k = arr.numElements()
      if (k >= 2) {
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
      }
    }
    new GenericInternalRow(Array[Any](n, sq))
  }
}
