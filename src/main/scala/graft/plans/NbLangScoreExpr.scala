package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Trained char-bigram Naive-Bayes model, baked into the scan as a plan
  * reference object (the [[BloomMightContain]] pattern) so scoring runs
  * IN-ROW instead of through the exploded-bigram join pipeline.
  *
  * Optimization-round rationale (guide §2.3/§2.4 — aggregate before you
  * shuffle / remove shuffles outright): the model is corpus-BOUNDED
  * (langs × observed char bigrams), so once it exists the per-document
  * score of EVERY language is document-local arithmetic. The previous
  * chain shuffled per-(doc, lang) partial sums, joined them back to the
  * corpus on (doc_id, mlang), and ran a per-doc window for the argmax —
  * three corpus-keyed exchanges plus a sort that this expression deletes
  * (the plan becomes: one model aggregate, then one scan). The per-row
  * integer math is EXACTLY the chain's µ-nat law — floor(ln((c+1)/(nl+V))
  * ·10⁶) per seen (lang, bigram), the lang's smoothed floor
  * lpu = floor(ln(1/(nl+V))·10⁶) for unseen — restated through the
  * identity Σc·lp_seen + (n_bg−n_seen)·lpu = n_bg·lpu + Σc·(lp−lpu),
  * which is exact in Long arithmetic (no new rounding sites), so the
  * DuckDB oracle hash-gates the restructure unchanged.
  *
  * The delta table stores lp−lpu ≥ 0 per (bigram, lang) (0 where
  * unseen), keyed by the bigram's UTF-8 bytes. Scoring walks the
  * document's bigram histogram ([[CharBigramHistogram.compute]] — the
  * same in-row collapse the old exploded stream used) and accumulates
  * `c·delta` per lang, then adds `n_bg·lpu`. Argmax ties break to the
  * ascending-first language, bit-identical to the chain's
  * `ORDER BY score_q DESC, mlang` row_number. */
final class NbLangModel(
    val langs: Array[String], // ascending; pred tie-break order
    val lpu: Array[Long], // per-lang smoothed floor, µ-nats
    val bgBytes: Array[Array[Byte]], // distinct observed bigrams (UTF-8)
    val delta: Array[Array[Long]]) // [bigram][lang] lp_q − lpu_q (0 unseen)
    extends Serializable {
  require(langs.length == lpu.length &&
    bgBytes.length == delta.length &&
    delta.forall(_.length == langs.length),
    "NB model arrays are not aligned")

  @transient lazy val langsU: Array[UTF8String] =
    langs.map(UTF8String.fromString)

  /** bigram → delta row; rebuilt lazily after task deserialization. */
  @transient lazy val index: java.util.HashMap[UTF8String, Array[Long]] = {
    val m = new java.util.HashMap[UTF8String, Array[Long]](
      bgBytes.length * 2)
    var i = 0
    while (i < bgBytes.length) {
      m.put(UTF8String.fromBytes(bgBytes(i)), delta(i))
      i += 1
    }
    m
  }
}

/** `nb_lang_score(s) → struct<pred_lang, n_bigrams, score_q>` over a
  * baked [[NbLangModel]]. NULL input scores as the empty document
  * (n_bigrams = 0, every lang at score 0, pred = first lang) — exactly
  * what the chain's `greatest(length(s)−1, 0)` + all-zero scores yield. */
case class NbLangScore(child: Expression, model: NbLangModel)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nb_lang_score needs string, got ${other.sql}")
    }

  override def dataType: DataType = NbLangScore.OutType
  override def nullable: Boolean = false
  override def prettyName: String = "nb_lang_score"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    NbLangScore.compute(
      if (v == null) null else v.asInstanceOf[UTF8String], model)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("nbModel", model, "graft.plans.NbLangModel")
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
         |${c.code}
         |org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
         |  graft.plans.NbLangScore.compute(
         |    ${c.isNull} ? null : ${c.value}, $m);
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): NbLangScore =
    copy(child = c)
}

object NbLangScore {
  val OutType: DataType = StructType(Seq(
    StructField("pred_lang", StringType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("score_q", LongType, nullable = false)))

  /** UTF-8 sequence length from its first byte — the same forgiving
    * walk [[CharBigramHistogram]] uses, so bigram boundaries (and the
    * instance count = numChars−1) are bit-identical to the chain. */
  @inline private def seqLen(b: Byte): Int =
    if (b >= 0) 1
    else if ((b & 0xE0) == 0xC0) 2
    else if ((b & 0xF0) == 0xE0) 3
    else if ((b & 0xF8) == 0xF0) 4
    else 1

  /** Static helper the generated code calls once per row.
    *
    * DIRECT walk, no histogram: the chain's in-row histogram collapse
    * existed to shrink an exchange that no longer exists here, and its
    * per-doc `Arrays.sort` was the scan's hottest loop. Scoring needs
    * only Σc·delta, which a per-INSTANCE accumulation computes in one
    * pass over the bytes — one hash probe + L long-adds per bigram,
    * zero sorts, zero allocations beyond the slice wrappers. Long
    * arithmetic is order-free, so the sum is bit-equal to the
    * per-distinct form. */
  def compute(s: UTF8String, m: NbLangModel): InternalRow = {
    val L = m.langs.length
    val scores = new Array[Long](L)
    var nBg = 0L
    if (s != null) {
      val bytes = s.getBytes // may alias the row buffer: lookups only
      val n = bytes.length
      if (n >= 2) {
        var p0 = 0 // bigram start
        var p1 = seqLen(bytes(0)) // second char start
        while (p1 < n) {
          val p2 = p1 + seqLen(bytes(p1)) // bigram end (exclusive)
          val d = m.index.get(UTF8String.fromBytes(bytes, p0, p2 - p0))
          if (d != null) {
            var l = 0
            while (l < L) { scores(l) += d(l); l += 1 }
          }
          nBg += 1
          p0 = p1
          p1 = p2
        }
        var l = 0
        while (l < L) { scores(l) += nBg * m.lpu(l); l += 1 }
      }
    }
    // argmax, ties to the ascending-first lang (langs sorted asc)
    var best = 0
    var l = 1
    while (l < L) { if (scores(l) > scores(best)) best = l; l += 1 }
    new GenericInternalRow(Array[Any](m.langsU(best), nBg, scores(best)))
  }
}
