package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Corpus BM25 model (term → quantized idf, plus the corpus scalars
  * N and total_len), baked into the scan as a plan reference object
  * (the [[TfidfModel]] sibling) so each document's BM25 top-k is
  * computed IN-ROW.
  *
  * Optimization-round rationale (guide §2.3/§2.4): identical to the
  * tfidf rewrite — the df table is vocabulary-bounded and every other
  * score input (tf, dl) is document-local, so the old plan's scoring
  * join, doc-keyed dl join, corpus crossJoin and per-doc row_number
  * window all delete. The scoring arithmetic is the shipped law
  * RESTATED EXACTLY: idf_q = (10⁶·(N+1)) div (df+1) (truncating
  * integral divide), the saturation term evaluated with the identical
  * left-associative double tree (constants folded the same way Catalyst
  * folds the lit() placements), and the µ-precision truncation
  * floor(idf·sat·10⁶) → Long → double / 10⁶ — so the top-k selection
  * with (score DESC, term ASC) ties is bit-identical to the window. */
final class Bm25Model(
    val termBytes: Array[Array[Byte]], // distinct corpus terms (UTF-8)
    val idfq: Array[Long], // per-term quantized idf
    val n: Long, // corpus doc count (dl > 0 docs)
    val totalLen: Long, // Σ dl
    val k1: Double,
    val b: Double)
    extends Serializable {
  require(termBytes.length == idfq.length,
    "bm25 model arrays are not aligned")

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

/** `bm25_topk(toks) → array<struct<term,tf,score>>` over a baked
  * [[Bm25Model]]: per-doc term histogram ([[TermHistogram.compute]] —
  * the tf law, one definition), BM25-score each distinct term, keep the
  * top `k` by (score DESC, term ASC). Terms missing from the model are
  * skipped (the old scoring join's inner semantics). */
case class Bm25TopTerms(child: Expression, model: Bm25Model, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"top-k width must be ≥ 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bm25_topk needs array<string>, got ${other.sql}")
    }

  override def dataType: DataType = Bm25TopTerms.OutType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bm25_topk"

  override def nullSafeEval(input: Any): Any =
    Bm25TopTerms.compute(input.asInstanceOf[ArrayData], model, k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bm25Model", model, "graft.plans.Bm25Model")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.Bm25TopTerms.compute($c, $m, $k)")
  }

  override protected def withNewChildInternal(c: Expression): Bm25TopTerms =
    copy(child = c)
}

object Bm25TopTerms {
  val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  /** Double-score concrete [[TopKBoard]] — the insertion LAW lives
    * there (one spelling with tfidf's Long board); only the payload
    * arrays and the native-type comparison live here. */
  private final class Board(k: Int) extends TopKBoard(k) {
    val terms = new Array[UTF8String](k)
    val tfs = new Array[Long](k)
    val scores = new Array[Double](k)
    var candTerm: UTF8String = _
    var candTf = 0L
    var candScore = 0.0
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
    * (score DESC, term ASC) order exactly); the double arithmetic
    * mirrors the chain's expression tree operation-for-operation. */
  def compute(arr: ArrayData, m: Bm25Model, k: Int): ArrayData = {
    val h = TermHistogram.compute(arr) // the tf law, one definition
    val nTerms = h.numElements()
    if (nTerms == 0) return new GenericArrayData(Array.empty[Any])
    // dl = size(lt) — the chain's scan-side token-array length
    val dl = arr.numElements().toDouble
    // the chain's per-doc constant: k1 · ((1−b) + ((b·dl)·N)/total_len)
    // — same left association, (1−b) and (k1+1) folded as Catalyst
    // folds the lit() constants
    val denomC = m.k1 * ((1.0 - m.b) +
      m.b * dl * m.n.toDouble / m.totalLen.toDouble)
    val k1p1 = m.k1 + 1.0
    val b = new Board(k)
    var i = 0
    while (i < nTerms) {
      val row = h.getStruct(i, 2)
      val idx = m.index.get(row.getUTF8String(0))
      if (idx != null) {
        val tfD = row.getLong(1).toDouble
        val sat = tfD * k1p1 / (tfD + denomC)
        // µ-precision truncation: floor(idf·sat·10⁶) is a LONG in the
        // chain (Floor: double → long), cast back to double, ÷ 10⁶
        b.candTerm = row.getUTF8String(0)
        b.candTf = row.getLong(1)
        b.candScore = math.floor(
          m.idfq(idx.intValue()).toDouble * sat * 1000000.0)
          .toLong.toDouble / 1000000.0
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
