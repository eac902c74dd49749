package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Catalog
import graft.functions.DateTimeF

/** One pipeline stage: returns false to short-circuit the rest (C2). */
final case class Stage(name: String, run: Catalog => Boolean)

/** Per-stage failure policy (C5) mirroring the reference DAG's
  * `default_args` (`taxi_trips_etl.py:17-20`): `retries: 1`,
  * `retry_delay: 3 minutes`, `execution_timeout: 3 hours`. A stage
  * attempt that throws OR exceeds the timeout is retried after the
  * delay; once retries are exhausted the run fails (Airflow marks the
  * task failed and, with `depends_on_past`, nothing downstream runs). */
final case class RetryPolicy(
    retries: Int = 1,
    retryDelay: scala.concurrent.duration.FiniteDuration =
      scala.concurrent.duration.Duration(3, "min"),
    timeout: scala.concurrent.duration.FiniteDuration =
      scala.concurrent.duration.Duration(3, "h"))

/** Stage exhausted its retries (the DAG-run failure, C5). */
final class StageFailedException(val stage: String, cause: Throwable)
  extends RuntimeException(
    s"stage '$stage' failed after retries: ${cause.getMessage}", cause)

/** One attempt exceeded the execution timeout (C5). */
final class StageTimeoutException(val stage: String, timeoutMs: Long)
  extends RuntimeException(
    s"stage '$stage' exceeded its ${timeoutMs} ms execution timeout")

/** Linear short-circuiting stage runner (SURVEY.md §2.11 C1–C3).
  *
  * Reference behavior: Airflow chains
  * `storage_to_bq >> normalization >> enrichment >> final_result`
  * (`taxi_trips_etl.py:238`) with a ShortCircuitOperator gate on stage 1
  * (`taxi_trips_etl.py:199-207`) and per-stage input-existence no-ops
  * (`taxi_trips_etl.py:99,128`). We implement the *intended* gate
  * semantics — true iff ≥1 row loaded — not the reference's buggy
  * last-blob-only flag (C2 note in SURVEY §2.11).
  */
object Runner {
  /** Runs stages in order; returns names of stages that ran. Each stage
    * gets the [[RetryPolicy]]'s attempt budget and per-attempt timeout;
    * a timed-out attempt has its Spark jobs cancelled via a job group
    * before the retry, so a hung stage cannot also hold the cluster. */
  def run(catalog: Catalog, stages: Seq[Stage],
          policy: RetryPolicy = RetryPolicy()): Seq[String] = {
    val ran = Seq.newBuilder[String]
    var go = true
    stages.foreach { st =>
      if (go) {
        ran += st.name
        go = runWithPolicy(catalog, st, policy)
        if (!go)
          catalog.spark.sparkContext.setJobDescription(
            s"pipeline short-circuited after ${st.name}")
      }
    }
    ran.result()
  }

  /** One stage attempt on a daemon thread with the policy timeout; the
    * attempt thread tags its Spark jobs with a unique job group so a
    * timeout can interrupt the actual running tasks, not just abandon
    * the thread. */
  private def attempt(catalog: Catalog, st: Stage,
                      timeoutMs: Long): Boolean = {
    val sc = catalog.spark.sparkContext
    val group = s"graft-stage-${st.name}-${System.nanoTime()}"
    // Streaming queries do NOT run under the stage's job group:
    // StreamExecution submits its microbatch jobs from its own thread
    // under its own group (the query runId), so cancelJobGroup below
    // never reaches them, and interrupting the stage thread only breaks
    // its awaitTermination — the query itself would keep RUNNING (a
    // leaked stream holding sources, state and cluster slots across
    // retries). Snapshot the active-query set before the attempt and
    // stop everything the attempt started (round 13, verdict item 6).
    val streamsBefore = catalog.spark.streams.active.map(_.id).toSet
    // Every failure path runs this same sweep (ADVICE r13: the round-13
    // form swept only on timeout, so a stage that started a stream and
    // then THREW still leaked it across retries).
    def stopLeakedStreams(): Unit =
      catalog.spark.streams.active
        .filterNot(q => streamsBefore.contains(q.id))
        .foreach { q =>
          try q.stop()
          catch { case scala.util.control.NonFatal(_) => () }
        }
    val task = new java.util.concurrent.FutureTask[Boolean](() => {
      sc.setJobGroup(group, s"pipeline stage ${st.name}",
        interruptOnCancel = true)
      try st.run(catalog) finally sc.clearJobGroup()
    })
    val t = new Thread(task, group)
    t.setDaemon(true)
    t.start()
    try task.get(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        task.cancel(true)
        sc.cancelJobGroup(group)
        stopLeakedStreams()
        // the stage thread may be INSIDE a .start() that completes after
        // the sweep above (ADVICE r13 race); wait for the cancelled
        // thread to actually die, then sweep once more so nothing that
        // registered late survives. The join is bounded: a thread stuck
        // in non-interruptible code must not hang the retry loop.
        t.join(10000)
        stopLeakedStreams()
        throw new StageTimeoutException(st.name, timeoutMs)
      case e: java.util.concurrent.ExecutionException =>
        // the FutureTask completed (exceptionally), so the stage thread
        // is done — no start() race on this path; sweep anything it
        // started before throwing
        stopLeakedStreams()
        throw e.getCause // the stage's own failure, not the wrapper's
    }
  }

  private def runWithPolicy(catalog: Catalog, st: Stage,
                            policy: RetryPolicy): Boolean = {
    var attempts = 0
    while (true) {
      try return attempt(catalog, st, policy.timeout.toMillis)
      catch {
        case scala.util.control.NonFatal(e) =>
          attempts += 1
          if (attempts > policy.retries)
            throw new StageFailedException(st.name, e)
          System.err.println(s"[pipeline] stage '${st.name}' attempt " +
            s"$attempts failed (${e.getMessage}); retrying in " +
            s"${policy.retryDelay.toMillis} ms")
          Thread.sleep(policy.retryDelay.toMillis)
      }
    }
    sys.error("unreachable")
  }
}

/** The reference's 4-stage taxi ETL re-expressed over the `events` fixture
  * (trips ≙ events, zones ≙ nation, ds-partitioned ingest ≙ date-path
  * parquet dirs). Every stage writes through the [[Catalog]] exactly like
  * the reference's BigQuery-table plumbing:
  *
  *  1. ingest    — date-path read (S1) + file-prefix glob (S2) →
  *                 `temp_trips` (S5); gate: any rows? (C2)
  *  2. normalize — keep-good filter (P2 shape) → `normalized_trips`
  *                 (WRITE_TRUNCATE, S6), drop `temp_trips` (S8)
  *  3. enrich    — W1 zone dedup + J1/J2 left joins + finish_rank=1 (P5) +
  *                 J3 4-key rejoin + daypart (F2) → `trips_{yyyyMMdd}` (S9),
  *                 drop `normalized_trips`
  *  4. final     — A1/A2 + bounded-rank top-100 (W2/O1) + USING(popularity)
  *                 ×2 (J4) → `most_populars_{yyyyMMdd}`
  *
  * Scale: each stage's plan is the scale-safe variant documented on the
  * corresponding CoreQueries operator (bucketed joins, bounded windows);
  * the inter-stage parquet materialization mirrors the reference's
  * observable intermediate tables (SURVEY §4) — fusing the stages into one
  * plan would be faster but intentionally changes observability.
  */
object TaxiPipeline {

  /** `ds` (e.g. "2024-01-05") → "yyyyMMdd" table suffix (F11). */
  def dsNoDash(ds: String): String = ds.replace("-", "")

  def ingest(srcDir: String, ds: String): Stage = Stage("ingest", { c =>
    val Array(y, m, d) = ds.split("-")
    val dayPath = s"$srcDir/$y/$m/$d"
    // An absent date path IS the reference's "empty day" (no blobs under
    // the prefix, `taxi_trips_etl.py:33`): gate false, don't crash.
    val fs = new org.apache.hadoop.fs.Path(dayPath)
      .getFileSystem(c.spark.sessionState.newHadoopConf())
    // A day directory that exists but holds no part-* files (e.g. only
    // _SUCCESS after an empty write) is ALSO an empty day: reading it
    // would throw "Unable to infer schema", not gate false.
    // (globStatus may return null rather than an empty array on some
    // Hadoop filesystems when nothing matches — treat both as empty.)
    val hasData = fs.exists(new org.apache.hadoop.fs.Path(dayPath)) &&
      Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(dayPath, "part-*")))
        .exists(_.nonEmpty)
    if (!hasData) {
      println(s"[pipeline] no data under $dayPath; short-circuiting")
      false
    } else {
      // S1 date-path prefix + S2 file-name prefix filter (FILE_PREFIX≙part-)
      val day = c.spark.read
        .option("pathGlobFilter", "part-*")
        .parquet(dayPath)
      c.save("temp_trips", day)
      c.load("temp_trips").limit(1).count() > 0 // C2: any data this day?
    }
  })

  def normalize: Stage = Stage("normalize", { c =>
    if (!c.exists("temp_trips")) { // C3 existence gate
      println("[pipeline] temp_trips missing; skipping normalize"); false
    } else {
      val df = c.load("temp_trips").filter(
        col("event_type") =!= "error" &&
          col("value") =!= 0 && col("value").isNotNull &&
          col("user_id").isNotNull)
      c.save("normalized_trips", df)
      c.drop("temp_trips")
      true
    }
  })

  def enrich(spark: SparkSession, sfDir: String, ds: String): Stage =
    Stage("enrich", { c =>
      if (!c.exists("normalized_trips")) {
        println("[pipeline] normalized_trips missing; skipping enrich"); false
      } else {
        val trips = c.load("normalized_trips")
          .withColumn("pickup_zone_id", col("event_id") % 25)
          .withColumn("dropoff_zone_id", col("user_id") % 25)
        val zones = graft.tbl(spark, sfDir, "nation")
          .select(col("n_nationkey"), col("n_name"),
            rank().over(Window.partitionBy("n_nationkey")
              .orderBy(expr("octet_length(n_name)").desc)).as("finish_rank"))
        val keys = Seq("event_id", "user_id", "pickup_zone_id",
          "dropoff_zone_id")
        val doff = trips
          .join(zones, trips("dropoff_zone_id") === zones("n_nationkey"),
            "left")
          .filter(col("finish_rank") === 1)
          .select(keys.map(col) :+ col("ts") :+
            col("n_name").as("dropoff_zone"): _*)
        val pup = trips
          .join(zones, trips("pickup_zone_id") === zones("n_nationkey"),
            "left")
          .filter(col("finish_rank") === 1)
          .select(keys.map(col) :+ col("n_name").as("pickup_zone"): _*)
        val enriched = doff.join(pup, keys, "inner")
          .select(col("event_id"), col("user_id"),
            col("pickup_zone"), col("dropoff_zone"),
            DateTimeF.daypart(col("ts")).as("daypart"))
        c.save(s"trips_${dsNoDash(ds)}", enriched)
        c.drop("normalized_trips")
        true
      }
    })

  def finalResult(ds: String): Stage = Stage("final_result", { c =>
    val in = s"trips_${dsNoDash(ds)}"
    if (!c.exists(in)) {
      println(s"[pipeline] $in missing; skipping final_result"); false
    } else {
      val trips = c.load(in)
      def topRanked(df: DataFrame, cnt: String, tie: Seq[String]): DataFrame =
        graft.ops.Ranked.topK(df, cnt, 100, tie)
      // Same rollup as TaxiOps.mostPopulars: marginal counts derive from
      // the (pickup, dropoff) pair counts (count-per-zone ≡ Σ pair
      // counts), so the three branches share one pair-count Exchange and
      // the trips table is aggregated once.
      val pairCounts = trips.groupBy("pickup_zone", "dropoff_zone")
        .agg(count(lit(1)).as("route_count"))
      val routes = topRanked(pairCounts,
        "route_count", Seq("pickup_zone", "dropoff_zone"))
        .select(col("pickup_zone").as("route_pickup"),
          col("dropoff_zone").as("route_dropoff"),
          col("route_count"), col("popularity"))
      val dropoffs = topRanked(
        pairCounts.groupBy("dropoff_zone")
          .agg(sum("route_count").as("dropoff_count")),
        "dropoff_count", Seq("dropoff_zone"))
        .select(col("dropoff_zone").as("top_dropoff"),
          col("dropoff_count"), col("popularity"))
      val pickups = topRanked(
        pairCounts.groupBy("pickup_zone")
          .agg(sum("route_count").as("pickup_count")),
        "pickup_count", Seq("pickup_zone"))
        .select(col("pickup_zone").as("top_pickup"),
          col("pickup_count"), col("popularity"))
      val result = routes
        .join(dropoffs, Seq("popularity"), "inner")
        .join(pickups, Seq("popularity"), "inner")
      c.save(s"most_populars_${dsNoDash(ds)}", result)
      true
    }
  })

  /** Build the 4-stage chain for one execution date (C4: `--ds`). */
  def stages(spark: SparkSession, sfDir: String, srcDir: String,
             ds: String): Seq[Stage] =
    Seq(ingest(srcDir, ds), normalize, enrich(spark, sfDir, ds),
      finalResult(ds))

  /** OPTIONAL fused execution of the same 4-stage chain: one declarative
    * plan from the day's source files to the most-populars result, no
    * staged tables. The staged [[stages]] runner stays the default — its
    * intermediate tables are the reference's observable surface — but
    * when only the final table is wanted, staging is pure overhead: this
    * mode reads the day once and lets Catalyst fuse ingest + normalize +
    * enrich projections into the scan.
    *
    * Equality with the staged chain (same argument as
    * [[graft.ops.TaxiOps.mostPopularsFused]]): the enrichment stage's
    * branch-and-rejoin emits n² rows per 4-key identity with n
    * normalized copies, and both zone names are functions of the
    * identity, so every (pickup_zone, dropoff_zone) count equals
    * Σ_identity n² — computed here as one identity-keyed count weighted
    * n² into the pair rollup. The ingest gate (C2/C3: absent or empty
    * day) returns None exactly where the staged runner short-circuits
    * before `final_result`.
    *
    * Scale: 1 fact scan + 1 identity shuffle vs the staged mode's
    * 4 writes + 4 re-reads + 2 scans + rejoin; the gate probe reads
    * file metadata plus at most one row. */
  def fused(spark: SparkSession, sfDir: String, srcDir: String,
            ds: String): Option[DataFrame] =
    fusedObserved(spark, sfDir, srcDir, ds).flatMap { case (df, _) =>
      // eager row gate for the Option contract (one limit-1 job);
      // single-action callers use the observation instead (fusedRun)
      val dayPath = fusedDayPath(srcDir, ds)
      val day = spark.read.option("pathGlobFilter", "part-*")
        .parquet(dayPath)
      if (day.limit(1).count() == 0) None else Some(df)
    }

  private def fusedDayPath(srcDir: String, ds: String): String = {
    val Array(y, m, d) = ds.split("-")
    s"$srcDir/$y/$m/$d"
  }

  /** The fused chain with the C2 ROW gate folded into the single plan
    * (round 15, verdict item 4) via `Dataset.observe`: the day scan
    * carries a CollectMetrics count, so the gate quantity ("any rows
    * this day?") is computed BY the one action that executes the plan —
    * no separate limit-1 gate job. Returns None only on the METADATA
    * gate (absent day dir / no part files — decidable from file listings
    * without a job, exactly where the staged runner's ingest stage gates
    * without reading data). The row gate's DECISION still precedes every
    * visible write: [[fusedRun]] stages the action's output under a
    * hidden name and only commits (renames) it into the catalog after
    * the observed count passes — an empty day leaves the catalog
    * without the table, same as the staged runner's short-circuit.
    *
    * Note the observation deliberately sits on the RAW day scan (the
    * gate counts pre-normalization rows, like the staged ingest's
    * `temp_trips` probe), which pins the normalize filter ABOVE the
    * CollectMetrics node — pushing it into the scan would change the
    * observed count. The rows are read either way (the gate needs
    * them); only the scan-level filter skip is forgone, priced at one
    * column-pruned pass over one day's partition. */
  def fusedObserved(spark: SparkSession, sfDir: String, srcDir: String,
      ds: String): Option[(DataFrame, org.apache.spark.sql.Observation)] = {
    val dayPath = fusedDayPath(srcDir, ds)
    val fs = new org.apache.hadoop.fs.Path(dayPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val hasFiles = fs.exists(new org.apache.hadoop.fs.Path(dayPath)) &&
      Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(dayPath, "part-*")))
        .exists(_.nonEmpty)
    if (!hasFiles) return None
    val gate = org.apache.spark.sql.Observation()
    val day = spark.read.option("pathGlobFilter", "part-*").parquet(dayPath)
      .observe(gate, count(lit(1)).as("rows"))
    val norm = day.filter(
      col("event_type") =!= "error" &&
        col("value") =!= 0 && col("value").isNotNull &&
        col("user_id").isNotNull)
    val idCnt = norm
      .withColumn("pickup_zone_id", col("event_id") % 25)
      .withColumn("dropoff_zone_id", col("user_id") % 25)
      .groupBy("event_id", "user_id", "pickup_zone_id", "dropoff_zone_id")
      .agg(count(lit(1)).as("graft_n"))
    val zones = graft.tbl(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"),
        rank().over(Window.partitionBy("n_nationkey")
          .orderBy(expr("octet_length(n_name)").desc)).as("finish_rank"))
    val withDoff = idCnt
      .join(zones, idCnt("dropoff_zone_id") === zones("n_nationkey"), "left")
      .filter(col("finish_rank") === 1)
      .select(col("event_id"), col("user_id"), col("pickup_zone_id"),
        col("graft_n"), col("n_name").as("dropoff_zone"))
    val wide = withDoff
      .join(zones, withDoff("pickup_zone_id") === zones("n_nationkey"),
        "left")
      .filter(col("finish_rank") === 1)
      .select(col("dropoff_zone"), col("n_name").as("pickup_zone"),
        col("graft_n"))
    val pairCounts = wide.groupBy("pickup_zone", "dropoff_zone")
      .agg(sum(col("graft_n") * col("graft_n")).as("route_count"))
    def topRanked(df: DataFrame, cnt: String, tie: Seq[String]): DataFrame =
      graft.ops.Ranked.topK(df, cnt, 100, tie)
    val routes = topRanked(pairCounts,
      "route_count", Seq("pickup_zone", "dropoff_zone"))
      .select(col("pickup_zone").as("route_pickup"),
        col("dropoff_zone").as("route_dropoff"),
        col("route_count"), col("popularity"))
    val dropoffs = topRanked(
      pairCounts.groupBy("dropoff_zone")
        .agg(sum("route_count").as("dropoff_count")),
      "dropoff_count", Seq("dropoff_zone"))
      .select(col("dropoff_zone").as("top_dropoff"),
        col("dropoff_count"), col("popularity"))
    val pickups = topRanked(
      pairCounts.groupBy("pickup_zone")
        .agg(sum("route_count").as("pickup_count")),
      "pickup_count", Seq("pickup_zone"))
      .select(col("pickup_zone").as("top_pickup"),
        col("pickup_count"), col("popularity"))
    Some((routes
      .join(dropoffs, Seq("popularity"), "inner")
      .join(pickups, Seq("popularity"), "inner"), gate))
  }

  /** Single-action gated fused run (round 15): executes the whole fused
    * chain — C2 row gate included — as ONE Spark action, writing to a
    * hidden staging table, then commits (renames) the staging dir into
    * the dated table name only if the observed gate passed. The catalog
    * never shows `most_populars_{ds}` for a day with files but zero
    * rows, preserving the staged runner's short-circuit contract while
    * eliminating the separate gate job. Returns the committed table
    * name, or None when either gate failed (staging dropped). */
  def fusedRun(spark: SparkSession, sfDir: String, srcDir: String,
      ds: String, cat: Catalog): Option[String] =
    fusedObserved(spark, sfDir, srcDir, ds).flatMap { case (df, gate) =>
      val table = s"most_populars_${dsNoDash(ds)}"
      val staging = s"_staging_$table" // underscore: invisible to tables()
      cat.save(staging, df) // THE one action; evaluates the gate metric
      // A MISSING metric means zero rows flowed through the observed
      // scan: CollectMetrics reports nothing when no task ever updated
      // its accumulator (the zero-row-files day), so absent ⇒ 0 is the
      // exact gate semantic, not a default-for-safety.
      val rows = gate.get.get("rows").map(_.asInstanceOf[Long]).getOrElse(0L)
      if (rows == 0L) {
        cat.drop(staging)
        println(s"[pipeline] day $ds has files but no rows; " +
          "fused gate short-circuited (staging dropped)")
        None
      } else {
        cat.drop(table)
        cat.rename(staging, table)
        Some(table)
      }
    }
}
