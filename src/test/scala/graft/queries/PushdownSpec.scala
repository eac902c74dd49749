package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.SparkSpec

/** Scan-shape assertions: the two properties that decide whether a plan
  * survives a 100 TB scale-up are (a) predicates reaching the parquet
  * reader (row-group skip + fewer rows decoded) and (b) the read schema
  * pruned to the referenced columns (a 16-column fact scan for a
  * 3-column query reads 5× the bytes). `.explain` shows both; this spec
  * pins them so a refactor can't silently un-push a filter or widen a
  * scan.
  */
class PushdownSpec extends SparkSpec {

  // Static plans in an AQE-off sibling session: adaptive execution wraps
  // scans inside query stages that TreeNode.collect does not descend
  // into, and scan shape is a PLANNING property anyway.
  private lazy val s = {
    val ns = spark.newSession()
    ns.conf.set("spark.sql.adaptive.enabled", "false")
    ns
  }

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }

  test("p2_normalize: scan-pushable predicates reach the parquet reader") {
    val df = graft.SparkEntry.queries("p2_normalize")(s, sf)
    val scan = scans(df).find(_.tableIdentifier.isEmpty).getOrElse(
      scans(df).head)
    val pushed = scan.metadata.getOrElse("PushedFilters", "[]")
    // the single-column predicates (IsNotNull, != literal) are pushable;
    // the column-to-column inequality legitimately is not
    assert(pushed.contains("IsNotNull"), s"no IsNotNull pushed: $pushed")
    assert(pushed.contains("Not(EqualTo(l_quantity,0.0"),
      s"!= 0 not pushed: $pushed")
  }

  test("p4_project_rename: read schema pruned to the projected columns") {
    val df = graft.SparkEntry.queries("p4_project_rename")(s, sf)
    val scan = scans(df).head
    val readCols = scan.requiredSchema.fieldNames.toSet
    assert(readCols === Set("l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice"),
      s"scan reads ${readCols.mkString(",")} — pruning lost")
  }

  test("a3_daily_metrics: fact scans read only the referenced columns") {
    val df = graft.SparkEntry.queries("a3_daily_metrics")(s, sf)
    val byTable = scans(df).map(s => s.requiredSchema.fieldNames.toSet)
    val li = byTable.find(_.contains("l_orderkey")).get
    val ord = byTable.find(_.contains("o_orderkey")).get
    assert(li === Set("l_orderkey", "l_shipdate", "l_extendedprice"),
      s"lineitem scan widened: $li")
    assert(ord === Set("o_orderkey", "o_orderdate"),
      s"orders scan widened: $ord")
  }
}
