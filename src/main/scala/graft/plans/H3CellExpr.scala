package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.H3

/** Native Catalyst expression for H3 cell indexing — the reference's
  * `` `carto-os`.carto.H3_FROMGEOGPOINT(point, res) `` slot
  * (`taxi_trips_etl_packages/queries/enrichment_query.py:10,17`),
  * returning the canonical lowercase 15-hex-digit cell id string.
  *
  * `res` is a compile-time Int (the reference always passes a literal),
  * so the generated code carries it as a constant and the call
  * participates in whole-stage codegen: one static JVM call per row on
  * the scan's doubles, no UDF SerDe, no boxing. [[H3.latLngToCell]]
  * itself is allocation-free per row (~1 µs/cell), so a 100 TB
  * enrichment scan stays one fused loop.
  */
case class H3Cell(left: Expression, right: Expression, res: Int)
    extends BinaryExpression with Serializable {
  require(res >= 0 && res <= H3.MaxRes,
    s"h3 resolution must be in [0, ${H3.MaxRes}], got $res")

  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable || right.nullable
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"h3_fromgeogpoint expects (double lat, double lng), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(lat: Any, lng: Any): Any =
    UTF8String.fromString(H3.latLngToCellString(
      lat.asInstanceOf[Double], lng.asInstanceOf[Double], res))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (latC, lngC) => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.H3.latLngToCellString($latC, $lngC, $res));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): H3Cell =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "h3_fromgeogpoint"
}
