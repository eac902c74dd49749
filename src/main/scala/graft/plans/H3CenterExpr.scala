package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.H3

/** Native Catalyst expressions for H3 `cellToLatLng` — the inverse of
  * [[H3Cell]] (`h3_fromgeogpoint`), which the reference's enrichment
  * slot (`taxi_trips_etl_packages/queries/enrichment_query.py:10,17`)
  * only consumes in the forward direction but any geo pipeline needs
  * to materialize cell geometry: cell→point joins, centroid exports,
  * reverse geocoding of aggregated cells.
  *
  * Input is the engine's canonical cell representation (lowercase
  * 15-hex-digit string, the `h3_9` column convention); output is the
  * exact cell-center latitude/longitude in degrees. Split into two
  * scalar expressions (same shape as [[WktCentroidLat]]/[[WktCentroidLng]])
  * so each stays a plain double inside whole-stage codegen — one static
  * JVM call per row, no UDF SerDe, no boxing.
  */
abstract class H3CenterBase extends UnaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a hex cell-id string, got " +
          child.dataType.simpleString)
}

case class H3CenterLat(child: Expression) extends H3CenterBase {
  override def nullSafeEval(cell: Any): Any =
    H3.cellCenterLat(cell.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.H3.cellCenterLat($c.toString())")
  override protected def withNewChildInternal(
      newChild: Expression): H3CenterLat = copy(child = newChild)
  override def prettyName: String = "h3_cell_lat"
}

case class H3CenterLng(child: Expression) extends H3CenterBase {
  override def nullSafeEval(cell: Any): Any =
    H3.cellCenterLng(cell.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.H3.cellCenterLng($c.toString())")
  override protected def withNewChildInternal(
      newChild: Expression): H3CenterLng = copy(child = newChild)
  override def prettyName: String = "h3_cell_lng"
}

/** `h3_cell_boundary(cell)` — the cell's polygon as WKT (h3lib
  * `cellToBoundary`; 6 corners, 5 for pentagons), lng-lat vertex
  * order, ring closed — composable with the engine's WKT surface
  * (`ST_ASTEXT` / centroid / polyfill). Codegen like its siblings:
  * one static call per row, no UDF SerDe. */
case class H3Boundary(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.StringType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"h3_cell_boundary expects a hex cell-id string, got " +
          child.dataType.simpleString)
  override def nullSafeEval(cell: Any): Any =
    UTF8String.fromString(
      H3.cellBoundaryWkt(cell.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.H3.cellBoundaryWkt($c.toString()))")
  override protected def withNewChildInternal(
      newChild: Expression): H3Boundary = copy(child = newChild)
  override def prettyName: String = "h3_cell_boundary"
}

/** `h3_cell_boundary_full(cell)` — [[H3Boundary]] plus h3lib's
  * edge-crossing DISTORTION vertices (exact bisector-plane
  * intersections; up to 10 vertices for face-straddling hexagons) —
  * full vertex parity where the plain form emits the 6 true corners
  * only. */
case class H3BoundaryFull(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.StringType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"h3_cell_boundary_full expects a hex cell-id string, got " +
          child.dataType.simpleString)
  override def nullSafeEval(cell: Any): Any =
    UTF8String.fromString(
      H3.cellBoundaryFullWkt(cell.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.H3.cellBoundaryFullWkt($c.toString()))")
  override protected def withNewChildInternal(
      newChild: Expression): H3BoundaryFull = copy(child = newChild)
  override def prettyName: String = "h3_cell_boundary_full"
}
