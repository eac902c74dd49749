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

  private val fastPolicy = RetryPolicy(
    retries = 1,
    retryDelay = scala.concurrent.duration.Duration(10, "ms"),
    timeout = scala.concurrent.duration.Duration(30, "s"))

  test("retry policy (C5): a stage that fails once succeeds on retry") {
    var calls = 0
    var downstream = false
    val ran = Runner.run(freshCatalog(), Seq(
      Stage("flaky", { _ =>
        calls += 1
        if (calls == 1) sys.error("transient")
        true
      }),
      Stage("after", { _ => downstream = true; true })), fastPolicy)
    assert(calls === 2)
    assert(ran === Seq("flaky", "after"))
    assert(downstream)
  }

  test("retry policy (C5): exhausted retries fail the run and halt") {
    var calls = 0
    var downstream = false
    val e = intercept[StageFailedException] {
      Runner.run(freshCatalog(), Seq(
        Stage("broken", { _ => calls += 1; sys.error("always") }),
        Stage("never", { _ => downstream = true; true })), fastPolicy)
    }
    assert(e.stage === "broken")
    assert(calls === 2) // initial attempt + 1 retry, like the reference
    assert(!downstream)
  }

  test("execution timeout (C5): a hung stage times out, retries, fails") {
    var calls = 0
    val policy = fastPolicy.copy(
      timeout = scala.concurrent.duration.Duration(200, "ms"))
    val e = intercept[StageFailedException] {
      Runner.run(freshCatalog(), Seq(
        Stage("hung", { _ =>
          calls += 1
          try Thread.sleep(60000) catch { case _: InterruptedException => }
          true
        })), policy)
    }
    assert(e.stage === "hung")
    assert(e.getCause.isInstanceOf[StageTimeoutException])
    assert(calls === 2)
  }

  test("execution timeout over a STREAMING stage (C5, round 13): the " +
      "hung query is torn down before the retry, not leaked") {
    // Job-group cancellation cannot reach a streaming query's jobs
    // (StreamExecution submits them under its own group), so the Runner
    // must stop queries the attempt started. The stage starts a file
    // stream with a slow ProcessingTime trigger and blocks in
    // awaitTermination (never terminates on its own), the policy times
    // it out twice, and afterwards NO active query may remain in the
    // session — a leaked stream would also poison every later test in
    // this suite's shared session.
    val srcDir = Files.createTempDirectory(
      java.nio.file.Paths.get(sys.props("user.dir"), "target"),
      "stream_hang").toString
    import spark.implicits._
    Seq(1L, 2L).toDF("x").write.mode("overwrite").parquet(srcDir)
    val before = spark.streams.active.length
    var starts = 0
    val policy = fastPolicy.copy(
      timeout = scala.concurrent.duration.Duration(2, "s"))
    val e = intercept[StageFailedException] {
      Runner.run(freshCatalog(), Seq(
        Stage("hung_stream", { c =>
          starts += 1
          val schema = c.spark.read.parquet(srcDir).schema
          val q = c.spark.readStream.schema(schema).parquet(srcDir)
            .writeStream.format("noop")
            .trigger(org.apache.spark.sql.streaming.Trigger
              .ProcessingTime("1 hour"))
            .start()
          q.awaitTermination() // hangs until torn down
          true
        })), policy)
    }
    assert(e.stage === "hung_stream")
    assert(e.getCause.isInstanceOf[StageTimeoutException])
    assert(starts === 2, "retry must have run a second attempt")
    // the teardown must be synchronous enough that nothing is left
    // running once the runner has thrown
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (spark.streams.active.length > before &&
        System.nanoTime() < deadline) Thread.sleep(50)
    assert(spark.streams.active.length === before,
      s"leaked streaming queries: ${
        spark.streams.active.map(_.name).mkString(", ")}")
  }

  test("fusedRun (round 15): ONE action runs gate + chain + staging " +
      "write; commit only when the observed C2 gate passes") {
    import org.apache.spark.sql.functions._
    val s = spark.newSession()
    val cat = new Catalog(s, Files.createTempDirectory(
      java.nio.file.Paths.get(sys.props("user.dir"), "target"),
      "wh_test").toString)
    val base = Files.createTempDirectory(
      java.nio.file.Paths.get(sys.props("user.dir"), "target"),
      "fsrc_test").toString
    val ds = "2024-01-05"
    // fixture write runs on the OUTER shared session deliberately (r16
    // verdict item 1): ExecutionListenerBus delivers only events whose
    // QueryExecution belongs to the registering session, so actions on
    // `spark` — this setup write, other suites' stragglers — can never
    // land in `s`'s counting window even though listener delivery is
    // async. Every event the listener below sees is an action of `s`,
    // and between registration and the marker the only code running
    // actions on `s` is fusedRun itself.
    graft.eventsTbl(spark, sf)
      .filter(to_date(col("ts")) === lit(ds).cast("date"))
      .coalesce(1).write.parquet(s"$base/2024/01/05")
    // session-scoped action counter: the single-action claim is the
    // point of the design (the old form ran a limit-1 gate count PLUS
    // the write — two actions)
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]
    s.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            d: Long): Unit = plans.add(qe.analyzed.toString)
        override def onFailure(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      })
    val committed = TaxiPipeline.fusedRun(s, sf, base, ds, cat)
    assert(committed === Some("most_populars_20240105"))
    assert(cat.exists("most_populars_20240105"))
    assert(cat.tables() === Seq("most_populars_20240105")) // no staging
    // deterministic quiescence (no sleep guessing): the listener bus is
    // FIFO per listener, so once this marker action's own event has
    // been delivered, every event fusedRun produced on `s` is already
    // in `plans` — then the count must be exactly marker + 1
    val markerTag = "graft_runner_marker"
    s.range(1).select(lit(1).as(markerTag)).collect()
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    def seenMarker() =
      plans.toArray(Array.empty[String]).exists(_.contains(markerTag))
    while (!seenMarker() && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(seenMarker(), "marker action event never delivered")
    val counted = plans.toArray(Array.empty[String])
      .filterNot(_.contains(markerTag))
    assert(counted.length === 1,
      s"fusedRun must be a single Spark action, saw ${counted.length}:\n" +
        counted.map(_.linesIterator.take(3).mkString(" | "))
          .mkString("\n"))
    // committed content equals the eager-gate fused plan (itself
    // oracle-equal to the staged chain via c_pipeline_fused)
    val cols = Seq("popularity", "route_pickup", "route_dropoff",
      "top_dropoff", "top_pickup")
    val viaEager = TaxiPipeline.fused(s, sf, base, ds).get
      .orderBy(cols.map(col): _*).collect().toSeq
    assert(cat.load("most_populars_20240105")
      .orderBy(cols.map(col): _*).collect().toSeq === viaEager)
    // zero-ROW day (files exist): observed gate short-circuits — no
    // table, no staging residue
    graft.eventsTbl(s, sf).filter(lit(false))
      .coalesce(1).write.parquet(s"$base/2024/01/06")
    assert(TaxiPipeline.fusedRun(s, sf, base, "2024-01-06", cat) === None)
    assert(cat.tables() === Seq("most_populars_20240105"))
    assert(!cat.exists("_staging_most_populars_20240106"))
    // absent day dir: metadata gate, no job at all
    assert(TaxiPipeline.fusedRun(s, sf, base, "2099-01-01", cat) === None)
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
