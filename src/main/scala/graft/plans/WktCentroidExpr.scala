package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.GeoF

/** Native Catalyst expressions for the WKT centroid (SURVEY.md §2.10's
  * "upgrade to codegen `Expression`" path for F5).
  *
  * Versus the Scala-UDF form: no ScalaUDF SerDe boundary, no closure
  * boxing, and the call participates in whole-stage codegen — the
  * generated code invokes a static JVM helper directly on the scan's
  * UTF8String, so a 100 TB geometry scan keeps one fused loop.
  * Degenerate/unparseable WKT yields NULL (spec'd in GeoFSpec).
  */
abstract class WktCentroidBase extends UnaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Which coordinate/model this expression extracts:
    * "Lng" | "Lat" (planar shoelace) | "SphLng" | "SphLat" (spherical,
    * the BigQuery-semantics option). Each maps to the static helper
    * `GeoF.centroid${pick}Java`. */
  protected def pick: String

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    val boxed = pick match {
      case "Lng"    => GeoF.centroidLngJava(w)
      case "Lat"    => GeoF.centroidLatJava(w)
      case "SphLng" => GeoF.centroidSphLngJava(w)
      case "SphLat" => GeoF.centroidSphLatJava(w)
    }
    if (boxed == null) null else boxed.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("centroid")
      s"""
         |java.lang.Double $r =
         |  graft.functions.GeoF.centroid${pick}Java($c.toString());
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })
}

case class WktCentroidLng(child: Expression) extends WktCentroidBase {
  override protected def pick: String = "Lng"
  override protected def withNewChildInternal(c: Expression): WktCentroidLng =
    copy(child = c)
  override def prettyName: String = "wkt_centroid_lng"
}

case class WktCentroidLat(child: Expression) extends WktCentroidBase {
  override protected def pick: String = "Lat"
  override protected def withNewChildInternal(c: Expression): WktCentroidLat =
    copy(child = c)
  override def prettyName: String = "wkt_centroid_lat"
}

case class WktCentroidSphLng(child: Expression) extends WktCentroidBase {
  override protected def pick: String = "SphLng"
  override protected def withNewChildInternal(
      c: Expression): WktCentroidSphLng = copy(child = c)
  override def prettyName: String = "wkt_centroid_sph_lng"
}

case class WktCentroidSphLat(child: Expression) extends WktCentroidBase {
  override protected def pick: String = "SphLat"
  override protected def withNewChildInternal(
      c: Expression): WktCentroidSphLat = copy(child = c)
  override def prettyName: String = "wkt_centroid_sph_lat"
}
