package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering graft's native expressions as
  * SQL functions, so `spark.sql("SELECT wkt_centroid_lng(geom) …")` works
  * next to the DataFrame API (SURVEY.md §7.3's extension point; enabled
  * via `GraftSession` or `spark.sql.extensions=graft.plans.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extensions: as-of join + columnar frame stats
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => FrameStatsStrategy)
    ext.injectFunction((
      FunctionIdentifier("wkt_centroid_lng"),
      new ExpressionInfo(classOf[WktCentroidLng].getName,
        "wkt_centroid_lng"),
      (children: Seq[Expression]) => WktCentroidLng(children.head)))
    ext.injectFunction((
      FunctionIdentifier("wkt_centroid_lat"),
      new ExpressionInfo(classOf[WktCentroidLat].getName,
        "wkt_centroid_lat"),
      (children: Seq[Expression]) => WktCentroidLat(children.head)))
  }
}
