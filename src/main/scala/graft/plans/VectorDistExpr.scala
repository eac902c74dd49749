package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `euclidean_dist(array<double>, array<double>) → double` — native
  * single-pass L2 distance, the codegen upgrade of the
  * `sqrt(aggregate(zip_with(a, b, (x,y) → (x−y)²)))` composition.
  * Catalyst higher-order functions are interpreted, and the composed
  * form materializes a per-row difference-square array; the IVF
  * assign step evaluates this once per (vector, centroid) pair per
  * Lloyd iteration — K×N×iters evaluations — so it must stay inside
  * whole-stage codegen with zero allocations.
  *
  * Bit-compatibility with the composed form (oracle-hash contract):
  * the fold is sequential left-to-right, each step `acc += (x−y)·(x−y)`
  * — the identical IEEE op sequence — and the result is `sqrt(acc)`.
  * NULL inputs, a length mismatch, or any NULL element yield NULL
  * (zip_with's padding makes the fold NULL in the composed form).
  *
  * Reference scope: backs the ANN extension ops (IVF assign/probe,
  * Lloyd's k-means); the reference engine has no vector surface.
  */
case class EuclideanDist(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"euclidean_dist needs two array<double>, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "euclidean_dist"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = Math.sqrt($acc);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EuclideanDist =
    copy(left = newLeft, right = newRight)
}

/** `plane_dots(array<double>) → array<double>` — the vector's dot
  * products against a fixed hyperplane family, all in one scan. The
  * single-plane composed form (`aggregate(zip_with(v, planeLit, ·×·))`)
  * is interpreted and walks the vector twice per plane; the JL
  * random-projection scan needs ProjDim of them per row. One helper
  * call does the P×dim multiply-add loop over primitive arrays, so the
  * projection stays a fused scan-side map at 100 TB.
  *
  * Bit-compatibility: element k is the left-to-right double fold of
  * `v[j] · plane(planeIdxs(k))[j]` — the same op sequence as the
  * composed dot. A NULL vector, length≠dim, or any NULL element makes
  * every composed per-plane dot NULL, so the whole result is NULL.
  */
case class PlaneDots(child: Expression, planeIdxs: Seq[Int], dim: Int)
    extends UnaryExpression with Serializable {

  @transient private lazy val planes: Array[Array[Double]] =
    PlaneSignBits.family(planeIdxs, dim)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"plane_dots needs array<double>, got ${other.sql}")
    }
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "plane_dots"

  override def nullSafeEval(v: Any): Any =
    PlaneDots.compute(v.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val resName = ctx.freshName("dots")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $resName =
         |  graft.plans.PlaneDots.compute($c, $planesRef);
         |if ($resName == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $resName;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): PlaneDots =
    copy(child = c)
}

object PlaneDots {

  /** Static helper the generated code calls once per row; null signals
    * the composed form's NULL-dot edges (length mismatch, NULL element). */
  def compute(a: ArrayData, planes: Array[Array[Double]]): ArrayData = {
    val n = a.numElements()
    if (planes.length > 0 && n != planes(0).length) return null
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    val v = a.toDoubleArray()
    val out = new Array[Any](planes.length)
    var k = 0
    while (k < planes.length) {
      val pl = planes(k)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v(j) * pl(j); j += 1 }
      out(k) = dot
      k += 1
    }
    new GenericArrayData(out)
  }
}
