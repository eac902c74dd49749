package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Corpus IDF table (term → quantized idf), baked into the scan as a
  * plan reference object (the [[NbLangModel]]/[[NgramLmModel]] pattern)
  * so each document's TF-IDF top-k is computed IN-ROW.
  *
  * Optimization-round rationale (guide §2.3/§2.4): the IDF table is
  * VOCABULARY-bounded (Zipf keeps word types to MBs at 100 TB — the same
  * bound the broadcast-df A/B rested on), so once it exists a document's
  * top-k salient terms are document-local arithmetic. The previous plan
  * materialized the per-(doc, term) tf stream (eager localCheckpoint),
  * joined it to the broadcast df, and ran a per-doc row_number window —
  * a corpus-sized checkpoint write + three reads plus the window's
  * doc-keyed exchange and sort, all deleted by this expression (the plan
  * becomes: one model aggregate, one scoring scan; the tf stream never
  * leaves its row). The scoring math is EXACTLY the shipped integer law:
  * idf_q = (10⁶·(N+1)) div (df+1) per term (driver-evaluated, same
  * truncating integral divide), score = tf·idf_q in Long arithmetic, and
  * the k winners ordered by (score DESC, term ASC) — bit-identical to
  * the window's `row_number ≤ k`, so the DuckDB oracle hash-gates the
  * restructure unchanged. */
final class TfidfModel(
    val termBytes: Array[Array[Byte]], // distinct corpus terms (UTF-8)
    val idfq: Array[Long]) // per-term quantized idf
    extends Serializable {
  require(termBytes.length == idfq.length,
    "tfidf model arrays are not aligned")

  /** term → idfq index; rebuilt lazily after task deserialization. */
  @transient lazy val index: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](termBytes.length * 2)
    var i = 0
    while (i < termBytes.length) {
      m.put(UTF8String.fromBytes(termBytes(i)), Integer.valueOf(i))
      i += 1
    }
    m
  }
}

/** `tfidf_topk(toks) → array<struct<term,tf,score>>` over a baked
  * [[TfidfModel]]: per-doc term histogram ([[TermHistogram.compute]] —
  * the tf law, one definition), score each distinct term, keep the top
  * `k` by (score DESC, term ASC). Terms missing from the model are
  * skipped (the old scoring join's inner semantics; on a model built
  * from the same corpus every term hits, by construction). */
case class TfidfTopTerms(child: Expression, model: TfidfModel, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"top-k width must be ≥ 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"tfidf_topk needs array<string>, got ${other.sql}")
    }

  override def dataType: DataType = TfidfTopTerms.OutType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "tfidf_topk"

  override def nullSafeEval(input: Any): Any =
    TfidfTopTerms.compute(input.asInstanceOf[ArrayData], model, k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("tfidfModel", model,
      "graft.plans.TfidfModel")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TfidfTopTerms.compute($c, $m, $k)")
  }

  override protected def withNewChildInternal(c: Expression): TfidfTopTerms =
    copy(child = c)
}

object TfidfTopTerms {
  val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false),
      StructField("score", LongType, nullable = false))),
    containsNull = false)

  /** Long-score concrete [[TopKBoard]] — the insertion LAW lives there
    * (one spelling with bm25's Double board); only the payload arrays
    * and the native-type comparison live here. */
  private final class Board(k: Int) extends TopKBoard(k) {
    val terms = new Array[UTF8String](k)
    val tfs = new Array[Long](k)
    val scores = new Array[Long](k)
    var candTerm: UTF8String = _
    var candTf = 0L
    var candScore = 0L
    protected def candBeats(i: Int): Boolean = candScore > scores(i)
    protected def moveSlot(from: Int, to: Int): Unit = {
      terms(to) = terms(from)
      tfs(to) = tfs(from)
      scores(to) = scores(from)
    }
    protected def writeSlot(i: Int): Unit = {
      terms(i) = candTerm
      tfs(i) = candTf
      scores(i) = candScore
    }
  }

  /** Static helper the generated code calls once per row: iterate the
    * histogram in term-ASC order, offer each modeled term to the
    * [[TopKBoard]] (strict `score >` displacement = the window's
    * (score DESC, term ASC) row_number ordering exactly). */
  def compute(arr: ArrayData, m: TfidfModel, k: Int): ArrayData = {
    val h = TermHistogram.compute(arr) // the tf law, one definition
    val n = h.numElements()
    val b = new Board(k)
    var i = 0
    while (i < n) {
      val row = h.getStruct(i, 2)
      val term = row.getUTF8String(0)
      val idx = m.index.get(term)
      if (idx != null) {
        b.candTerm = term
        b.candTf = row.getLong(1)
        b.candScore = row.getLong(1) * m.idfq(idx.intValue())
        b.offer()
      }
      i += 1
    }
    val out = new Array[Any](b.cnt)
    i = 0
    while (i < b.cnt) {
      out(i) = new GenericInternalRow(
        Array[Any](b.terms(i), b.tfs(i), b.scores(i)))
      i += 1
    }
    new GenericArrayData(out)
  }
}
