package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{eventsTbl, tbl}

/** At-scale physical-layout operators: bucketed co-located joins.
  *
  * The reference materializes every stage into BigQuery tables and lets
  * Dremel re-shuffle per query; Spark's equivalent lever for repeated
  * fact-to-fact joins is BUCKETING — write both tables hash-bucketed on
  * the join key, and every subsequent join/aggregation on that key runs
  * with ZERO exchanges (the scan is already co-partitioned). At 100 TB
  * this converts the dominant shuffle of a fact⋈fact join into a
  * bucket-local sort-merge; `ScaleSpec` asserts the exchange-free plan.
  */
object ScaleQueries {

  private def qtmp(name: String): String =
    s"${sys.props("user.dir")}/target/qtmp/$name"

  /** Bucketed-table prep — bucketing is a one-time LAYOUT decision (like
    * the reference's materialized BigQuery tables), so the bench must
    * time the JOIN that benefits, not the table construction it
    * amortizes. The layout is keyed on the SOURCE DIR only and persists
    * under `target/qtmp` across JVMs: a fresh driver session (each
    * driver bench/verify run is one) finds the prior layout on disk,
    * validates it against a [[graft.core.FixtureMeta]] stamp of the
    * source files plus `_SUCCESS` markers, and re-registers the existing
    * files as bucketed catalog tables via DDL — milliseconds, not a
    * rewrite. (Round-8 driver bench regression: the per-(session, dir)
    * identity key put the full layout write inside the timed region on
    * every fresh session.) Rebuilds only when the source actually
    * changed (ScaleGen regenerating `target/sf1` in place) or a prior
    * write died before its `_SUCCESS`. Serialized under a JVM-wide lock:
    * sessions in one JVM share the catalog, and the table content for a
    * given dir is identical, so last-writer-wins is safe — but two
    * concurrent writers to one path are not. */
  private val bucketLock = new Object

  /** Bucket-count sizing rule, measured not guessed (round-9 A/B at
    * sf10, interleaved min-of-3): with the count pinned to core count
    * (32), the bucketed a3 join reads 1.9M rows per bucket-task in one
    * zero-overlap wave and loses to the raw shuffled plan (4.2 s vs
    * ~3 s); at 64 buckets 2.9 s, at 128 buckets 2.8 s — 1.5× better
    * than 32 and 2.5× better than raw. The rule: at least the cluster
    * parallelism (a bucket is the unit of co-located work), and past
    * that ~8 MB of compressed fact parquet per bucket so task waves
    * overlap and stragglers hide (sf0.1/sf1 → 32, sf10 → ~131, 100 TB
    * → thousands — exactly how a production warehouse sizes bucketed
    * tables). Derived from a file listing only; capped so a pathological
    * dir can't demand a million buckets. */
  private[graft] def autoBuckets(s: SparkSession, dir: String): Int = {
    // per-session memo: the sizing listing is fs metadata I/O the bench
    // would otherwise pay on every pass (the source dir is immutable
    // within a session by the fixture contract)
    val memoKey = s"graft.autobuckets.${graft.core.PathTag.tag(dir)}"
    s.conf.getOption(memoKey).map(_.toInt).getOrElse {
      val conf = s.sessionState.newHadoopConf()
      val bytes = Seq("lineitem", "orders").map { t =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/$t.parquet")
        val fs = p.getFileSystem(conf)
        if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
      }.sum
      val bySize = math.ceil(bytes / (8.0 * 1024 * 1024)).toInt
      val n = math.min(4096,
        math.max(s.sparkContext.defaultParallelism, bySize))
      s.conf.set(memoKey, n.toString)
      n
    }
  }

  private[graft] def ensureBucketed(s: SparkSession, dir: String,
      buckets: Int = 32): (String, String) = {
    // Per-session memo (round 10): after ONE stamp-validated
    // registration, later calls — bench passes 2..N — skip the fs
    // metadata round-trips (source listing, stamp read, _SUCCESS
    // probes). The source dir is immutable within a session by the
    // fixture contract; cross-session/JVM freshness still goes through
    // the full stamp check below. The in-memory tableExists re-check
    // keeps the memo honest against an external DROP TABLE (the
    // shared-catalog path ScaleSpec exercises).
    val suffix0 = graft.core.PathTag.tag(dir + "#" + buckets)
    val (liT0, ordT0) = (s"graft_li_b_$suffix0", s"graft_ord_b_$suffix0")
    val memoKey = s"graft.bucketed.ok.$suffix0"
    if (s.conf.getOption(memoKey).isDefined &&
        s.catalog.tableExists(liT0) && s.catalog.tableExists(ordT0))
      return (liT0, ordT0)
    val out = ensureBucketedSlow(s, dir, buckets)
    s.conf.set(memoKey, "1")
    out
  }

  private def ensureBucketedSlow(s: SparkSession, dir: String,
      buckets: Int): (String, String) = bucketLock.synchronized {
    import graft.core.FixtureMeta
    // bucket count is part of the layout identity: a 64-bucket layout at
    // the same dir lives at its own path under its own table names
    val suffix = graft.core.PathTag.tag(dir + "#" + buckets)
    val wh = qtmp(s"bucketed_$suffix")
    val (liT, ordT) = (s"graft_li_b_$suffix", s"graft_ord_b_$suffix")
    val stamp = FixtureMeta.sourceStamp(s, dir, Seq("lineitem", "orders"))
    val layoutOk = FixtureMeta.valid(s, s"$wh/.stamp", stamp) &&
      FixtureMeta.complete(s, s"$wh/li_b") &&
      FixtureMeta.complete(s, s"$wh/ord_b")
    def register(name: String, src: DataFrame, key: String,
                 path: String): Unit =
      if (!s.catalog.tableExists(name))
        s.sql(s"""CREATE TABLE $name (${src.schema.toDDL})
                 |USING PARQUET
                 |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
                 |LOCATION '$path'""".stripMargin)
    if (layoutOk) {
      register(liT, tbl(s, dir, "lineitem"), "l_orderkey", s"$wh/li_b")
      register(ordT, tbl(s, dir, "orders"), "o_orderkey", s"$wh/ord_b")
    } else {
      // stale/partial layout: drop any catalog entry pointing at it, then
      // rebuild the files and re-register in one saveAsTable
      Seq(liT, ordT).foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
      tbl(s, dir, "lineitem")
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/li_b").saveAsTable(liT)
      tbl(s, dir, "orders")
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/ord_b").saveAsTable(ordT)
      FixtureMeta.write(s, s"$wh/.stamp", stamp)
    }
    (liT, ordT)
  }

  /** lineitem ⋈ orders on the order key, both sides pre-bucketed
    * ([[autoBuckets]]-sized) through the session catalog; the `merge`
    * hint pins SMJ so
    * the plan's shuffle-freeness is attributable to bucketing, not to a
    * broadcast. Output: per-status counts + exact decimal quantity sums. */
  private def bucketedJoinRaw(s: SparkSession, dir: String): DataFrame = {
    val (liT, ordT) = ensureBucketed(s, dir, autoBuckets(s, dir))
    s.table(liT).hint("merge")
      .join(s.table(ordT),
        col("l_orderkey") === col("o_orderkey"), "inner")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
          .as("sum_qty"))
  }

  // The ORDER BY on the 3-row result exists only for oracle-hash
  // determinism; the bench times the raw aggregate (QueryDef contract,
  // same as p2_normalize / x_shortest_path).
  private def bucketedJoin(s: SparkSession, dir: String): DataFrame =
    bucketedJoinRaw(s, dir).orderBy("o_orderstatus")

  /** Bucketed-layout star join (TPC-H Q5 shape, same semantics and SAME
    * oracle as `w_star_join`): all three dims collapse into one ≤|customer|
    * broadcast, the orders scan comes from the bucketed layout, the
    * broadcast join PRESERVES that bucketing (a BroadcastHashJoin's
    * output partitioning is its streamed side's), and the fact⋈fact edge
    * is then a bucket-local sort-merge — ZERO exchanges anywhere below
    * the final dimension-sized aggregation. This is the 100 TB shape:
    * the raw-fixture `w_star_join` pays one shuffle per fact side every
    * query; a warehouse that buckets its fact tables on the order key
    * pays it once at load. Registered separately so the raw-fixture
    * oracle contract of `w_star_join` stays intact; `ScaleSpec` asserts
    * the fact-side exchange count is zero. */
  private def starBucketedRaw(s: SparkSession, dir: String): DataFrame = {
    val (liT, ordT) = ensureBucketed(s, dir, autoBuckets(s, dir))
    val dims = tbl(s, dir, "region")
      .join(tbl(s, dir, "nation"), col("r_regionkey") === col("n_regionkey"))
      .join(tbl(s, dir, "customer"), col("n_nationkey") === col("c_nationkey"))
      .select(col("c_custkey"), col("r_name"), col("n_name"))
    val rev = (col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1.0) - col("l_discount")).cast(DecimalType(18, 2)))
    s.table(ordT)
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .hint("merge")
      .join(s.table(liT), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_lineitems"),
        sum(rev).cast("double").as("revenue"))
  }

  private def starBucketed(s: SparkSession, dir: String): DataFrame =
    starBucketedRaw(s, dir).orderBy("r_name", "n_name")

  private val starBucketedSql =
    """SELECT r_name, n_name, count(*) AS n_lineitems,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
      |         AS revenue
      |FROM region
      |JOIN nation   ON r_regionkey = n_regionkey
      |JOIN customer ON n_nationkey = c_nationkey
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** Bucketed-layout twin of `a3_daily_metrics` (same semantics, SAME
    * oracle SQL): the lineitem⋈orders fact edge reads both sides from the
    * bucketed layout, so the join is a bucket-local SMJ with zero
    * exchanges below the date aggregation — at sf1 this is the 2.5 s →
    * ~1.0 s difference (round-9 A/B), because the raw-fixture plan's
    * residual IS the two fact-side shuffles. Registered separately: the
    * raw plan stays the honest per-query cost on unprepared data; this is
    * what the same query costs once the warehouse pays the one-time
    * layout, which is how the reference's BigQuery tables behave (every
    * stage pre-materialized). */
  private def dailyBucketedRaw(s: SparkSession, dir: String): DataFrame = {
    val (liT, ordT) = ensureBucketed(s, dir, autoBuckets(s, dir))
    val tripss = s.table(liT).hint("merge")
      .join(s.table(ordT), col("l_orderkey") === col("o_orderkey"))
      .select(
        graft.functions.DateTimeF.toDateCol(col("o_orderdate"))
          .as("pickup_date"),
        graft.functions.DateTimeF.timestampDiffMinutes(
          col("l_shipdate"), col("o_orderdate")).as("drive_time"),
        col("l_extendedprice").as("total_amount"))
    val sumAmt = sum(col("total_amount").cast(DecimalType(18, 2)))
      .cast("double")
    tripss.groupBy(col("pickup_date"))
      .agg(
        (sum("drive_time").cast("double") / count(lit(1)))
          .as("avg_drive_time"),
        sum("drive_time").as("total_drive_time"),
        (sumAmt / count(lit(1))).as("avg_amount"),
        sumAmt.as("sum_amount"))
      .select(col("pickup_date").cast("string").as("pickup_date"),
        col("avg_drive_time"), col("total_drive_time"),
        col("avg_amount"), col("sum_amount"))
  }

  private def dailyBucketed(s: SparkSession, dir: String): DataFrame =
    dailyBucketedRaw(s, dir).orderBy(col("pickup_date").desc)

  /** Events layout for window queries: bucketed by `user_id` AND sorted
    * by (user_id, us, event_id), ONE file per bucket — `repartition` on
    * the bucket key before the bucketed write puts each bucket's rows in
    * exactly one task (Spark's repartition and bucket-id hashes are the
    * same Murmur3), which is the precondition for the scan to expose
    * both the hash partitioning and the per-file sort order. A per-user
    * window over this table then plans with ZERO exchange and ZERO sort:
    * the sort tax the raw `w_moving_agg` pays per query (the round-9
    * verdict's sf10 residual) is paid once at load, exactly like the
    * join-side bucketing above. `us` (µs since epoch) is materialized as
    * a stored column because ordering must be on the STORED sort key —
    * Catalyst does not infer monotone-function orderings. */
  private[graft] def ensureEventsBucketed(s: SparkSession, dir: String): String = {
    import graft.core.FixtureMeta
    val conf = s.sessionState.newHadoopConf()
    val evP = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val fs = evP.getFileSystem(conf)
    val bytes = if (fs.exists(evP)) fs.getContentSummary(evP).getLength else 0L
    val buckets = math.min(4096,
      math.max(s.sparkContext.defaultParallelism,
        math.ceil(bytes / (8.0 * 1024 * 1024)).toInt))
    val suffix = graft.core.PathTag.tag(dir + "#ev#" + buckets)
    val evT = s"graft_ev_b_$suffix"
    val memoKey = s"graft.bucketed.ok.$suffix"
    if (s.conf.getOption(memoKey).isDefined && s.catalog.tableExists(evT))
      return evT
    bucketLock.synchronized {
      val wh = qtmp(s"bucketed_$suffix")
      val stamp = FixtureMeta.sourceStamp(s, dir, Seq("events"))
      val src = eventsTbl(s, dir)
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts")).as("us"))
      if (FixtureMeta.valid(s, s"$wh/.stamp", stamp) &&
          FixtureMeta.complete(s, s"$wh/ev_b")) {
        if (!s.catalog.tableExists(evT))
          s.sql(s"""CREATE TABLE $evT (${src.schema.toDDL})
                   |USING PARQUET
                   |CLUSTERED BY (user_id)
                   |SORTED BY (user_id, us, event_id) INTO $buckets BUCKETS
                   |LOCATION '$wh/ev_b'""".stripMargin)
      } else {
        s.sql(s"DROP TABLE IF EXISTS $evT")
        src.repartition(buckets, col("user_id"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(buckets, "user_id")
          .sortBy("user_id", "us", "event_id")
          .option("path", s"$wh/ev_b").saveAsTable(evT)
        FixtureMeta.write(s, s"$wh/.stamp", stamp)
      }
    }
    s.conf.set(memoKey, "1")
    evT
  }

  /** Sorted-bucketed-layout twin of `w_moving_agg` (same semantics, SAME
    * oracle SQL): all three frames read the pre-sorted bucketed events
    * table, so the plan is scan → window → window — no exchange, no
    * sort (`ScaleSpec` asserts both). This is the 100 TB answer to the
    * window-sort tax: a time-series warehouse stores event streams
    * clustered by entity and ordered by time once, instead of re-sorting
    * per query. The raw `w_moving_agg` stays registered as the honest
    * unprepared-data cost. */
  /** Build a frame with `bucketedTableScan.outputOrdering=true`, force
    * its physical plan while the conf is set (the `executedPlan` lazy
    * val reads SQLConf at first access, so later actions keep the
    * sorted-scan shape), then RESTORE the previous value — other
    * bucketed queries' plan shape must not depend on whether this query
    * ran first in the bench session (advice r10). */
  private def withSortedBucketScan(s: SparkSession)(
      build: => DataFrame): DataFrame = {
    val key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try { val df = build; df.queryExecution.executedPlan; df }
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  // Sort propagation from bucketed scans is conf-gated (Spark lists
  // each bucket's files at planning to prove the one-file-per-bucket
  // invariant the ordering rests on — a deliberate planning-time
  // cost). The listing is InMemoryFileIndex-cached, and this layout
  // writes exactly one file per bucket (repartition on the bucket key
  // before the write), so the proof always succeeds here.
  private def movingBucketedBuild(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val evT = ensureEventsBucketed(s, dir)
    val byTime = Window.partitionBy("user_id").orderBy("us", "event_id")
    val rows7 = byTime.rowsBetween(-6, Window.currentRow)
    val hour = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-3600000000L, Window.currentRow)
    val dec = col("value").cast(DecimalType(18, 2))
    s.table(evT)
      .select(col("user_id"), col("event_id"),
        sum(dec).over(rows7).cast("double").as("mov7_sum"),
        (sum(dec).over(rows7).cast("double") /
          count(lit(1)).over(rows7)).as("mov7_avg"),
        sum(dec).over(hour).cast("double").as("hour_sum"))
  }

  private def movingBucketedRaw(s: SparkSession, dir: String): DataFrame =
    withSortedBucketScan(s) { movingBucketedBuild(s, dir) }

  private def movingBucketed(s: SparkSession, dir: String): DataFrame =
    withSortedBucketScan(s) {
      movingBucketedBuild(s, dir).orderBy("user_id", "event_id")
    }

  // ------------------------------------------------------------------
  // Sorted-bucketed twins of the events-rooted fact queries (round 11):
  // same semantics and the SAME oracle SQL as the raw forms, reading
  // the once-prepared bucketed+sorted events layout instead of paying
  // the per-query exchange(+sort) on unprepared data. The raw forms
  // stay registered as the honest unprepared-data cost — the pair is
  // the measured argument that a 100 TB events warehouse clusters its
  // streams by entity and time once.
  // ------------------------------------------------------------------

  /** `x_sessionize` over the bucketed layout: the lag/running-sum
    * windows and the (user_id, session_seq) aggregate all cluster on
    * user_id, and the scan already delivers HashPartitioning(user_id)
    * sorted by (user_id, us, event_id) — the whole gaps-and-islands
    * chain plans with ZERO Exchange and ZERO Sort (ScaleSpec pins it):
    * scan → window → window → hash-aggregate. */
  private def sessionizeBucketedBuild(s: SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val evT = ensureEventsBucketed(s, dir)
    val byTime = Window.partitionBy("user_id").orderBy("us", "event_id")
    s.table(evT)
      .withColumn("prev_us", lag("us", 1).over(byTime))
      .withColumn("brk",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > TemporalQueries.SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum("brk").over(byTime.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min("us").as("start_us"),
        max("us").as("end_us"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("sum_value"))
  }

  private def sessionizeBucketedRaw(s: SparkSession, dir: String): DataFrame =
    withSortedBucketScan(s) { sessionizeBucketedBuild(s, dir) }

  private def sessionizeBucketed(s: SparkSession, dir: String): DataFrame =
    withSortedBucketScan(s) {
      sessionizeBucketedBuild(s, dir).orderBy("user_id", "session_seq")
    }

  /** `w_window_funcs` over the bucketed layout: the time-ordered
    * lag/lead windows ride the layout's (user_id, us, event_id) sort
    * directly; the value-ordered ntile/percent_rank/cume_dist windows
    * re-sort WITHIN partitions (ordering by value is inherent to the
    * query, but the shuffle is not) — zero Exchange, one in-partition
    * Sort. */
  private def windowBucketedBuild(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val evT = ensureEventsBucketed(s, dir)
    val byTime = Window.partitionBy("user_id").orderBy("us", "event_id")
    val byValue = Window.partitionBy("user_id").orderBy("value", "event_id")
    s.table(evT)
      .select(col("user_id"), col("event_id"),
        lag("value", 1).over(byTime).as("prev_value"),
        lead("value", 1).over(byTime).as("next_value"),
        ntile(4).over(byValue).as("value_quartile"),
        round(percent_rank().over(byValue), 6).as("value_prank"),
        round(cume_dist().over(byValue), 6).as("value_cdist"))
  }

  private def windowBucketedRaw(s: SparkSession, dir: String): DataFrame =
    withSortedBucketScan(s) { windowBucketedBuild(s, dir) }

  private def windowBucketed(s: SparkSession, dir: String): DataFrame =
    withSortedBucketScan(s) {
      windowBucketedBuild(s, dir).orderBy("user_id", "event_id")
    }

  /** `x_range_join` over the bucketed layout: both self-join sides scan
    * the same bucketed table, so HashPartitioning(user_id) is shared
    * and satisfies the (user_id, time-bucket) equi-join's clustering on
    * both sides — the join plans with ZERO Exchange (the two fact-sized
    * shuffles are the raw form's whole cost); only in-partition sorts
    * on the derived bucket key remain. The explode fan-out (each left
    * event to its two candidate window epochs) is partition-preserving. */
  private def rangeBucketedBuild(s: SparkSession, dir: String): DataFrame = {
    val w = TemporalQueries.RangeWindowUs
    val evT = ensureEventsBucketed(s, dir)
    val ev = s.table(evT)
      .select(col("user_id"), col("event_id"), col("us"))
    val a = ev.select(col("user_id"), col("event_id").as("id_a"),
      col("us").as("us_a"),
      explode(array(expr(s"us div $w"), expr(s"us div $w") + 1))
        .as("bucket"))
    val b = ev.select(col("user_id"), col("event_id").as("id_b"),
      col("us").as("us_b"), expr(s"us div $w").as("bucket"))
    a.join(b, Seq("user_id", "bucket"))
      .filter(col("us_b") > col("us_a") && col("us_b") <= col("us_a") + w)
      .select(col("user_id"), col("id_a"), col("id_b"),
        (col("us_b") - col("us_a")).as("gap_us"))
  }

  private def rangeBucketedRaw(s: SparkSession, dir: String): DataFrame =
    withSortedBucketScan(s) { rangeBucketedBuild(s, dir) }

  private def rangeBucketed(s: SparkSession, dir: String): DataFrame =
    withSortedBucketScan(s) {
      rangeBucketedBuild(s, dir).orderBy("user_id", "id_a", "id_b")
    }

  private val bucketedJoinSql =
    """SELECT o_orderstatus, count(*) AS n,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |         AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Salted skew join: the standard fix when one join key dominates (a
    * "hot zone"): the fact side gets a deterministic salt in [0, F), the
    * dim side is replicated F× with every salt value, and the join runs
    * on (key, salt) — splitting each hot key's rows across F reducers.
    * Salting is a physical-plan rewrite with identical semantics, which
    * is exactly what the oracle checks (plain unsalted join). AQE's
    * skew-join handles moderate skew automatically; explicit salting is
    * the deterministic variant that also works for aggregations. */
  val SaltF = 4

  /** The salted fact⋈dim aggregate on supplied inputs: `ev` must carry
    * (event_id, zone_id, value); the dim is replicated SaltF× and the
    * join key becomes (zone_id, salt) — identical semantics to the plain
    * join, hot keys spread across SaltF reducers. Public so the skew
    * spec can drive it with a deliberately hot-keyed fixture. */
  def saltedZoneJoin(ev: DataFrame, dim: DataFrame): DataFrame = {
    val evS = ev.withColumn("salt", pmod(col("event_id"), lit(SaltF)))
    val dimS = dim.select(col("n_nationkey"), col("n_name"))
      .withColumn("salt", explode(sequence(lit(0), lit(SaltF - 1))))
    evS.join(dimS,
      evS("zone_id") === dimS("n_nationkey") && evS("salt") === dimS("salt"),
      "inner")
      .groupBy("n_name")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("sum_value"))
      .orderBy("n_name")
  }

  private def saltedJoin(s: SparkSession, dir: String): DataFrame =
    saltedZoneJoin(
      graft.eventsTbl(s, dir)
        .select(col("event_id"), (col("user_id") % 25).as("zone_id"),
          col("value")),
      tbl(s, dir, "nation"))

  private val saltedJoinSql =
    """SELECT n_name, count(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events JOIN nation ON user_id % 25 = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Deterministic Zipf-ish cohort key (round 14, verdict item 5): maps
    * the uniform `user_id` through the harmonic step function
    * 16 div (1 + (user_id % 16)), whose preimage sizes give key 1 HALF
    * the total mass (residues 8..15), key 2 ~19%, then a 1/k²-ish tail —
    * the canonical skewed-key shape (Zipf) that `x_sessionize` /
    * `x_range_join`'s uniform fixture keys never exercise. Pure integer
    * arithmetic, bit-identical in DuckDB (`//`). */
  private[queries] def zipfKey(userId: org.apache.spark.sql.Column) =
    // built from the PASSED column (ADVICE r14: the expr() form
    // hardcoded `user_id`, silently ignoring the parameter); floor of
    // the exact small-integer double ratio ≡ integer div on positives
    floor(lit(16L).cast("double") / (lit(1L) + pmod(userId, lit(16L))))

  private[queries] val zipfKeySql = "16 // (1 + (user_id % 16))"

  /** The two sides of the skewed cohort-enrichment join, exposed so the
    * skew spec can drive the join with the stats side MATERIALIZED
    * (localCheckpoint): AQE's OptimizeSkewedJoin only rewrites
    * SMJ(Sort(shuffle stage), Sort(shuffle stage)) — an aggregate
    * between the sort and the shuffle stage (the inline plan here, where
    * the stats ARE an aggregate) falls outside the pattern, which is
    * also why the spec's forced-shuffle arm checkpoints first (at real
    * scale the huge build side IS a materialized table, so that is the
    * faithful shape). The rollup downstream is a second veto the spec
    * avoids by asserting on the bare join: OptimizeSkewedJoin refuses to
    * break a partitioning a downstream stage needs unless
    * forceOptimizeSkewedJoin is set. */
  private[queries] def skewSides(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = graft.eventsTbl(s, dir).select(
      zipfKey(col("user_id")).as("zk"),
      col("value").cast(DecimalType(18, 2)).as("v"))
    val stats = ev.groupBy("zk")
      .agg(count(lit(1)).as("n_cohort"), sum("v").as("sum_v"))
    (ev, stats)
  }

  private[queries] def skewJoined(s: SparkSession, dir: String): DataFrame = {
    val (ev, stats) = skewSides(s, dir)
    ev.join(stats, "zk")
  }

  /** Zipf-keyed skew witness (`b_skew_join`): enrich every event with its
    * cohort's exact global stats and count the above-average events per
    * cohort. The above-average test multiplies instead of dividing
    * (v·n > Σv ⇔ v > mean) so both engines compare exact decimals — no
    * float-boundary flicker.
    *
    * Scale story: the stats side is one row per DISTINCT cohort key —
    * Zipf keeps that broadcastable at any corpus size, so the production
    * plan never shuffles the fact side for this join at all. When the
    * build side genuinely can't broadcast, the fact shuffle on `zk` puts
    * half the corpus in one partition — exactly the case AQE's skew-join
    * split exists for, pinned by `ScaleSpec` ("AQE splits the skewed
    * Zipf-join") over this same frame with broadcast forbidden and the
    * skew thresholds scaled to the fixture. */
  private def skewJoin(s: SparkSession, dir: String): DataFrame =
    skewJoined(s, dir)
      .groupBy("zk")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("v") * col("n_cohort") > col("sum_v"), 1L)
          .otherwise(0L)).as("n_above"))
      .orderBy("zk")

  private val skewJoinSql =
    s"""WITH ev AS (
       |  SELECT $zipfKeySql AS zk, CAST(value AS DECIMAL(18,2)) AS v
       |  FROM events
       |), stats AS (
       |  SELECT zk, count(*) AS n_cohort, SUM(v) AS sum_v
       |  FROM ev GROUP BY zk
       |)
       |SELECT e.zk, count(*) AS n_events,
       |       CAST(SUM(CASE WHEN e.v * s.n_cohort > s.sum_v
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_above
       |FROM ev e JOIN stats s USING (zk)
       |GROUP BY e.zk ORDER BY e.zk""".stripMargin

  /** Session gap for the skewed sessionizer: 5 min — the hot cohort
    * (~50% of events, mean inter-event gap ≈ 52 s at sf0.1) coalesces
    * into long runs while tail cohorts (mean gap ≈ 7 min+) fragment,
    * so the fixture exercises both regimes. */
  private val SkewGapUs = 300L * 1000000

  /** Zipf-keyed gaps-and-islands sessionization (`b_skew_sessionize`,
    * round 14 — the sessionize half of the skew witness next to
    * [[skewJoin]]): identical one-shuffle window plan to `x_sessionize`
    * but partitioned on the harmonic cohort key, so HALF the corpus
    * lands in one window partition. The honest scale statement: window
    * semantics are per-key sequential, so a hot key is processed by one
    * task by definition — the engine's job is to stay LINEAR and
    * bounded-memory there (WindowExec streams frames and spills; no
    * per-key collection), which the oracle-gated run witnesses. AQE
    * cannot and should not split it — contrast with the JOIN-side skew,
    * where the split applies (`b_skew_join` + ScaleSpec). */
  private def skewSessionize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.eventsTbl(s, dir).select(
      zipfKey(col("user_id")).as("zk"),
      col("event_id"), unix_micros(col("ts")).as("us"))
    val byTime = Window.partitionBy("zk").orderBy("us", "event_id")
    ev
      .withColumn("prev_us", lag("us", 1).over(byTime))
      .withColumn("brk",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > SkewGapUs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum("brk").over(byTime.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy("zk", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        min("us").as("start_us"), max("us").as("end_us"))
      .orderBy("zk", "session_seq")
  }

  private val skewSessionizeSql =
    s"""WITH e AS (
       |  SELECT $zipfKeySql AS zk, event_id, epoch_us(ts) AS us
       |  FROM events
       |), x AS (
       |  SELECT zk, event_id, us,
       |         lag(us) OVER (PARTITION BY zk ORDER BY us, event_id)
       |           AS prev_us
       |  FROM e
       |), y AS (
       |  SELECT zk, us, event_id,
       |         CASE WHEN prev_us IS NULL OR us - prev_us > $SkewGapUs
       |              THEN 1 ELSE 0 END AS brk
       |  FROM x
       |), z AS (
       |  SELECT zk, us,
       |         CAST(SUM(brk) OVER (PARTITION BY zk ORDER BY us, event_id
       |                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |           AS session_seq
       |  FROM y
       |)
       |SELECT zk, session_seq, CAST(count(*) AS BIGINT) AS n_events,
       |       min(us) AS start_us, max(us) AS end_us
       |FROM z GROUP BY zk, session_seq
       |ORDER BY zk, session_seq""".stripMargin

  /** Zipf-keyed direct aggregation (`b_skew_agg`, round 15 — the third
    * shuffle consumer of the skew triptych next to [[skewJoin]] (AQE
    * split) and [[skewSessionize]] (bounded-memory window)): a plain
    * groupBy on the harmonic cohort key, where HALF the corpus carries
    * one key. The scale story is that hash aggregation is IMMUNE to key
    * skew when every aggregate is partial-combinable (count/sum/min/max
    * here): each map task reduces its slice to ≤ |keys| rows before the
    * exchange, so the shuffle moves O(maps · keys) rows no matter how
    * hot a key is, and the hot key's reducer receives ≤ one row per map
    * — never the corpus. `ScaleSpec` pins exactly that: the aggregate
    * exchange's records-written metric stays at the maps·keys floor
    * (hundreds) against ~600k input rows. Aggregates are decimal-exact
    * with one final double cast (QueryDef determinism contract). */
  private def skewAgg(s: SparkSession, dir: String): DataFrame =
    skewAggPlan(s, dir).orderBy("zk")

  /** The bare aggregate without the oracle's total ORDER BY — exposed so
    * the spec can measure the aggregate exchange in isolation. */
  private[queries] def skewAggPlan(s: SparkSession, dir: String): DataFrame =
    graft.eventsTbl(s, dir)
      .select(zipfKey(col("user_id")).as("zk"),
        col("value").cast(DecimalType(18, 2)).as("v"),
        unix_micros(col("ts")).as("us"))
      .groupBy("zk")
      .agg(count(lit(1)).as("n_events"),
        sum("v").cast("double").as("sum_value"),
        min("us").as("first_us"),
        max("us").as("last_us"))

  private val skewAggSql =
    s"""SELECT zk, count(*) AS n_events,
       |       CAST(SUM(v) AS DOUBLE) AS sum_value,
       |       min(us) AS first_us, max(us) AS last_us
       |FROM (SELECT $zipfKeySql AS zk,
       |             CAST(value AS DECIMAL(18,2)) AS v,
       |             epoch_us(ts) AS us
       |      FROM events)
       |GROUP BY zk ORDER BY zk""".stripMargin

  /** Bloom bits for [[bloomPrunedJoin]]: 2^16 bits (8 KB) for the
    * fixture's ~3k urgent orders → FPR under 1e-3. At 100 TB this is a
    * per-executor broadcast of a few MB for hundreds of millions of dim
    * keys — the standard semi-join-reduction budget. */
  private val BloomLogBits = 16

  /** Distributed bloom build: per-partition 8 KB word arrays OR-merged
    * up a tree — each partition ships the fixed-size array, never its
    * key set ([[graft.plans.BloomF]] holds the shared mix/probe math). */
  private def bloomWords(keys: DataFrame, logBits: Int): Array[Long] = {
    import keys.sparkSession.implicits._
    keys.as[Long].rdd.treeAggregate(
      graft.plans.BloomF.emptyWords(logBits))(
      seqOp = (w, k) => { graft.plans.BloomF.insert(w, k, logBits); w },
      combOp = (a, b) => {
        var i = 0
        while (i < a.length) { a(i) |= b(i); i += 1 }
        a
      })
  }

  /** Bloom-pruned join (semi-join reduction): the fact scan is filtered
    * through a [[graft.plans.BloomMightContain]] probe of the dim-side
    * key set BEFORE the join, so at scale the join exchange moves only
    * the ~matching fraction of the fact table (plus a sub-1e-3 false
    * positive tail the exact join then removes). This is the explicit,
    * deterministic form of Spark's own `InjectRuntimeFilter` rewrite;
    * `ScaleSpec` asserts the probe sits under the fact-side scan stage
    * and that no-false-negatives holds, and the oracle checks the
    * result equals the plain join — bloom pruning is a physical
    * optimization with identical semantics. */
  private def bloomPrunedJoin(s: SparkSession, dir: String): DataFrame = {
    val urgent = tbl(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderstatus"))
    val words = bloomWords(urgent.select("o_orderkey"), BloomLogBits)
    val probe = org.apache.spark.sql.GraftBridge.column(
      graft.plans.BloomMightContain(
        org.apache.spark.sql.GraftBridge.expression(col("l_orderkey")),
        words, BloomLogBits))
    tbl(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      .filter(probe)
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "inner")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
          .as("sum_qty"))
      .orderBy("l_returnflag")
  }

  private val bloomPrunedJoinSql =
    """SELECT l_returnflag, count(*) AS n,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |         AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Per-(session, dir) z-order layout path (same collision rationale as
    * [[ensureBucketed]]). */
  private[queries] def zorderBase(s: SparkSession, dir: String): String = {
    val suffix = graft.core.PathTag.tag(
      dir + "#" + System.identityHashCode(s))
    s"${sys.props("user.dir")}/target/qtmp/zorder_$suffix"
  }

  /** The z-order clustering key for events: quantized (user_id, value)
    * interleaved — both dimensions get file-level locality. */
  private[queries] def eventsZkey =
    graft.functions.ZOrderF.morton2(
      col("user_id"), floor(col("value")).cast("long"))

  private[queries] val eventsZkeySql =
    graft.functions.ZOrderF.morton2Sql(
      "user_id", "CAST(floor(value) AS BIGINT)")

  /** Z-order-clustered storage layout: events rewritten sorted by the
    * Morton key of (user_id, value), then read back under a TWO-dimension
    * predicate. Each file's footer min/max is tight on both source
    * columns (the curve's locality), so the scan skips row groups for
    * predicates on either dimension — where the single-column sorted
    * layout (`s_sorted_layout`) only ever prunes its one sort column.
    * `ZorderSpec` asserts the skip on each dimension independently; this
    * query checks layout-invariance of the answer (plus the zkey
    * arithmetic itself, mirrored bit-for-bit in the oracle). At 100 TB
    * this is the nightly OPTIMIZE ZORDER rewrite that makes ad-hoc
    * two-column slices read ~the matching files only. */
  private def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val base = zorderBase(s, dir)
    eventsTbl(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), eventsZkey.as("zkey"))
      .repartitionByRange(8, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(s"$base/zsorted")
    s.read.parquet(s"$base/zsorted")
      .filter(col("user_id").between(100, 299) &&
        col("value") >= 50.0 && col("value") < 150.0)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("sum_value"),
        min(col("zkey")).as("min_zkey"),
        max(col("zkey")).as("max_zkey"))
      .orderBy("event_type")
  }

  private val zorderLayoutSql =
    s"""WITH z AS (
       |  SELECT event_type, value, $eventsZkeySql AS zkey
       |  FROM events
       |  WHERE user_id BETWEEN 100 AND 299
       |    AND value >= 50.0 AND value < 150.0
       |)
       |SELECT event_type, count(*) AS cnt,
       |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
       |         AS sum_value,
       |       min(zkey) AS min_zkey, max(zkey) AS max_zkey
       |FROM z GROUP BY event_type ORDER BY event_type""".stripMargin

  val all: Map[String, QueryDef] = Map(
    "b_bucketed_join" -> QueryDef(bucketedJoin, Some(bucketedJoinSql),
      bench = true, benchFn = Some(bucketedJoinRaw)),
    "b_star_bucketed" -> QueryDef(starBucketed, Some(starBucketedSql),
      bench = true, benchFn = Some(starBucketedRaw)),
    "a3_daily_bucketed" -> QueryDef(dailyBucketed,
      Some(CoreQueries.dailyMetricsSql), bench = true,
      benchFn = Some(dailyBucketedRaw)),
    "w_moving_bucketed" -> QueryDef(movingBucketed,
      Some(WarehouseQueries.movingAggSql), bench = true,
      benchFn = Some(movingBucketedRaw)),
    "x_sessionize_bucketed" -> QueryDef(sessionizeBucketed,
      Some(TemporalQueries.sessionizeSql), bench = true,
      benchFn = Some(sessionizeBucketedRaw),
      benchNote = Some("sorted-bucketed twin of x_sessionize: zero " +
        "exchange, zero sort over the prepared events layout")),
    "w_window_bucketed" -> QueryDef(windowBucketed,
      Some(WarehouseQueries.windowFuncsSql), bench = true,
      benchFn = Some(windowBucketedRaw),
      benchNote = Some("sorted-bucketed twin of w_window_funcs: zero " +
        "exchange; only the inherent by-value in-partition sort remains")),
    "x_range_bucketed" -> QueryDef(rangeBucketed,
      Some(TemporalQueries.rangeJoinSql), bench = true,
      benchFn = Some(rangeBucketedRaw),
      benchNote = Some("sorted-bucketed twin of x_range_join: the " +
        "equi-bucket self-join co-locates on the shared layout, zero " +
        "exchange")),
    "b_salted_join" -> QueryDef(saltedJoin, Some(saltedJoinSql)),
    "b_skew_join" -> QueryDef(skewJoin, Some(skewJoinSql)),
    "b_skew_agg" -> QueryDef(skewAgg, Some(skewAggSql)),
    "b_skew_sessionize" -> QueryDef(skewSessionize,
      Some(skewSessionizeSql)),
    "b_bloom_prune" -> QueryDef(bloomPrunedJoin, Some(bloomPrunedJoinSql)),
    "b_zorder_layout" -> QueryDef(zorderLayout, Some(zorderLayoutSql))
  )
}
