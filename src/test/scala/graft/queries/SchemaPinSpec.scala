package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import graft.SparkSpec
import graft.core.Catalog

/** Catalog-pinned schemas for evolved tables: the query-time read takes
  * its schema from the catalog entry, never from footer reconciliation. */
class SchemaPinSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat(tag: String): Catalog =
    new Catalog(spark, s"target/qtmp-test/schema_pin_$tag")

  test("pinned read surfaces the superset with nulls for pre-evolution files") {
    val cat = freshCat("superset")
    val base = s"${cat.warehouseDir}/t"
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$base/day=1")
    Seq((3L, 30L, 0.5), (4L, 40L, 0.7)).toDF("k", "v", "w")
      .write.mode("overwrite").parquet(s"$base/day=2")
    cat.pinSchema("t", StructType(Seq(
      StructField("k", LongType), StructField("v", LongType),
      StructField("w", DoubleType))))
    val got = cat.loadPinned("t")
    // data columns exactly as pinned; partition col appended from dirs
    assert(got.schema.fieldNames.toSeq === Seq("k", "v", "w", "day"))
    val rows = got.select("k", "w").as[(Long, Option[Double])]
      .collect().sortBy(_._1)
    assert(rows.toSeq === Seq(1L -> None, 2L -> None,
      3L -> Some(0.5), 4L -> Some(0.7)))
  }

  test("read schema comes from the catalog entry, not the footers") {
    val cat = freshCat("authority")
    val base = s"${cat.warehouseDir}/t"
    Seq((1L, 10L)).toDF("k", "v").write.mode("overwrite").parquet(base)
    // pin a shape NO footer contains (extra column, reordered fields):
    // inference could never produce it, so if the read surfaces it, the
    // schema provably came from the pin
    cat.pinSchema("t", StructType(Seq(
      StructField("v", LongType), StructField("k", LongType),
      StructField("not_in_any_footer", DoubleType))))
    val got = cat.loadPinned("t")
    assert(got.schema.fieldNames.toSeq ===
      Seq("v", "k", "not_in_any_footer"))
    assert(got.as[(Long, Long, Option[Double])].collect().toSeq ===
      Seq((10L, 1L, None)))
  }

  test("pin survives a catalog reopen and hides from the table listing") {
    val cat = freshCat("reopen")
    Seq((1L, 2L)).toDF("a", "b")
      .write.mode("overwrite").parquet(s"${cat.warehouseDir}/t")
    cat.pinSchema("t", StructType(Seq(
      StructField("a", LongType), StructField("b", LongType))))
    val reopened = freshCat("reopen")
    assert(reopened.pinnedSchema("t").map(_.fieldNames.toSeq) ===
      Some(Seq("a", "b")))
    assert(reopened.tables() === Seq("t")) // _schemas metadata hidden
    assert(reopened.loadPinned("t").count() === 1L)
  }

  test("loadPinned without a pin fails loudly") {
    val cat = freshCat("missing")
    intercept[IllegalStateException](cat.loadPinned("nope"))
  }
}
