package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for H3 polyfill: (MULTI)POLYGON WKT →
  * sorted array of the hex ids of every res-`res` cell whose CENTER
  * lies inside the polygon (h3lib `polygonToCells` center-containment
  * semantics; [[graft.functions.GeoF.h3PolyfillScala]]).
  *
  * `res` is a compile-time Int, so the generated code carries it as a
  * constant and the call participates in whole-stage codegen — one
  * static JVM call per row, no UDF SerDe. The intended 100 TB shape
  * is polyfill-the-DIMENSION (few polygons), explode, and equi-join
  * fact rows indexed by [[graft.plans.H3Cell]] — polygon containment
  * joins priced as hash-join collision volume, never per-row
  * point-in-polygon over the fact table.
  */
case class H3Polyfill(child: Expression, res: Int)
    extends UnaryExpression with Serializable {
  require(res >= 0 && res <= 15, s"h3 polyfill res must be in [0, 15], got $res")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"h3_polyfill expects a WKT string, got " +
          child.dataType.simpleString)
  }

  override def nullSafeEval(wkt: Any): Any =
    H3Polyfill.cellsData(wkt.asInstanceOf[UTF8String], res)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, wktC => {
      s"""
         |${ev.value} = graft.plans.H3Polyfill.cellsData($wktC, $res);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): H3Polyfill =
    copy(child = newChild)

  override def prettyName: String = "h3_polyfill"
}

object H3Polyfill {
  /** Static bridge for generated code: WKT → ArrayData of hex cells. */
  def cellsData(wkt: UTF8String, res: Int): ArrayData = {
    val ids = graft.functions.GeoF.h3PolyfillScala(wkt.toString, res)
    new GenericArrayData(
      ids.map(UTF8String.fromString(_).asInstanceOf[Any]))
  }
}
