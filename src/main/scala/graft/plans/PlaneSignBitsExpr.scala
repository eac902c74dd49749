package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `plane_sign_bits(array<double>) → bigint` — packed sign bits of a
  * vector's dot products against a fixed hyperplane family: bit k is set
  * iff `<v, plane(planeIdxs(k))> >= 0`. This is the single-scan native
  * form of `VectorF.planeSignBit`'s `zip_with → aggregate → when`
  * composition, which Catalyst evaluates INTERPRETED (higher-order
  * functions have no codegen; each plane walks the vector twice and
  * allocates an intermediate product array per row). For an LSH bucket
  * id over P planes the composed form is 2P interpreted array walks per
  * vector; this expression is one codegen-resident helper call doing a
  * P×dim multiply-add loop over a primitive `double[]` — on a 100 TB
  * embedding scan the bucket computation is the whole map side of the
  * ANN probe and the near-dup band fan-out, so it must stay fused.
  *
  * Bit-compatibility contract with the composed form (keeps oracle
  * hashes): dot folds left-to-right in doubles; a NULL vector, a vector
  * whose length differs from `dim`, or any NULL element makes every
  * plane's dot NULL, whose `when(dot >= 0, …)` contributes 0 — so those
  * rows yield 0L, not NULL (callers wrap with `coalesce(…, 0L)` for the
  * NULL-vector case since this expression null-propagates like any
  * unary). Plane components come from the same deterministic
  * `VectorF.hyperplaneComponent(p, d)` splitmix64 map both engines
  * inline.
  *
  * Reference scope: backs the similarity-search extension ops
  * (SURVEY.md §2 "beyond the reference": ANN LSH, embedding near-dup,
  * k-NN graph); the reference engine has no vector surface.
  */
case class PlaneSignBits(child: Expression, planeIdxs: Seq[Int], dim: Int)
    extends UnaryExpression with Serializable {

  @transient private lazy val planes: Array[Array[Double]] =
    PlaneSignBits.family(planeIdxs, dim)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"plane_sign_bits needs array<double>, got ${other.sql}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "plane_sign_bits"

  override def nullSafeEval(v: Any): Any =
    PlaneSignBits.compute(v.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.PlaneSignBits.compute($c, $planesRef)")
  }

  override protected def withNewChildInternal(c: Expression): PlaneSignBits =
    copy(child = c)
}

object PlaneSignBits {

  def family(planeIdxs: Seq[Int], dim: Int): Array[Array[Double]] =
    planeIdxs.map { p =>
      Array.tabulate(dim)(d => graft.functions.VectorF.hyperplaneComponent(p, d))
    }.toArray

  /** Static helper the generated code calls once per row. */
  def compute(a: ArrayData, planes: Array[Array[Double]]): Long = {
    if (planes.length == 0) return 0L
    val n = a.numElements()
    // composed-form edge semantics: length mismatch or any NULL element
    // nulls the dot for EVERY plane → all bits 0
    if (n != planes(0).length) return 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return 0L
      i += 1
    }
    val v = a.toDoubleArray()
    var bits = 0L
    var k = 0
    while (k < planes.length) {
      val pl = planes(k)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v(j) * pl(j); j += 1 }
      if (dot >= 0.0) bits |= 1L << k
      k += 1
    }
    bits
  }
}
