package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import graft.core.Catalog

class RunnerSpec extends SparkSpec {

  private def freshCatalog(): Catalog =
    new Catalog(spark, Files.createTempDirectory(
      java.nio.file.Paths.get(sys.props("user.dir"), "target"),
      "wh_test").toString)

  test("runner executes stages in order") {
    var order = Vector.empty[String]
    val ran = Runner.run(freshCatalog(), Seq(
      Stage("a", { _ => order :+= "a"; true }),
      Stage("b", { _ => order :+= "b"; true }),
      Stage("c", { _ => order :+= "c"; true })))
    assert(ran === Seq("a", "b", "c"))
    assert(order === Vector("a", "b", "c"))
  }

  test("short-circuit gate (C2): false halts downstream stages") {
    var cRan = false
    val ran = Runner.run(freshCatalog(), Seq(
      Stage("ingest", _ => true),
      Stage("gate", _ => false),
      Stage("never", { _ => cRan = true; true })))
    assert(ran === Seq("ingest", "gate"))
    assert(!cRan)
  }

  test("empty-day gate (C2): ingest returns false on a missing date path") {
    val cat = freshCatalog()
    val missing = s"${cat.warehouseDir}/no_such_src"
    assert(TaxiPipeline.ingest(missing, "2099-01-01").run(cat) === false)
    assert(!cat.exists("temp_trips"))
  }

  test("existence gate (C3): normalize skips when temp_trips is missing") {
    val cat = freshCatalog()
    assert(!cat.exists("temp_trips"))
    assert(TaxiPipeline.normalize.run(cat) === false)
    assert(!cat.exists("normalized_trips"))
  }

  test("catalog lifecycle: truncate/append/exists/drop (S5–S8)") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.save("t", Seq(1, 2).toDF("x"))
    cat.append("t", Seq(3).toDF("x"))
    assert(cat.exists("t"))
    assert(cat.load("t").count() === 3)
    cat.save("t", Seq(9).toDF("x")) // truncate semantics
    assert(cat.load("t").count() === 1)
    cat.drop("t")
    assert(!cat.exists("t"))
    assert(cat.tables().isEmpty)
  }
}
