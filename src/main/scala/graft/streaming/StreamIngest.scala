package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming surface (SURVEY.md §2.9).
  *
  * The reference implements no streaming; its README describes — and
  * rejects — an event-driven GCS-trigger variant (`README.md:60-62`).
  * This module is that unbuilt alternative, Spark-first: the ingest stage
  * as an incremental file-source stream with exactly-once file tracking,
  * plus the standard streaming enrichments a daily-batch user would adopt
  * next (watermarked windowed aggregation, stateful per-key processing).
  *
  * Scale notes: the file stream lists only NEW files per microbatch
  * (checkpointed log, no relisting of history); watermark bounds state;
  * `maxFilesPerTrigger` paces backfills. `Trigger.AvailableNow` drains
  * everything pending then stops — the streaming equivalent of the
  * reference's daily batch run, and what makes these queries
  * deterministic enough to oracle-check.
  */
object StreamIngest {

  /** Incremental file-source ingest: stream parquet files appearing under
    * `srcDir` into an append-only parquet table at `destDir`, draining
    * available input synchronously (AvailableNow). Returns the ingested
    * table. */
  def ingestAvailableNow(spark: SparkSession, srcDir: String,
                         destDir: String, checkpoint: String): DataFrame = {
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "4")
      .parquet(srcDir)
      .writeStream
      .format("parquet")
      .option("path", destDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(destDir)
  }

  /** Watermarked tumbling-window aggregation over the event stream:
    * events per (day, event_type), late data beyond 1 day dropped.
    * State is bounded by the watermark — safe on an unbounded stream. */
  def dailyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").cast("date").cast("string").as("day"),
        col("event_type"), col("cnt"))

  /** Per-user running state via mapGroupsWithState: event count + the
    * value at the latest EVENT time per user (the
    * `KeyValueGroupedDataset` custom-state surface). "Latest" is defined
    * by (event ts, value) — event-time order with a value tie-break —
    * NOT by processing order: microbatch boundaries and partition order
    * are nondeterministic, so processing-order "last" would give a
    * different answer per run. ProcessingTimeTimeout keeps state finite
    * in production; with AvailableNow the state simply drains once. */
  def userRunningStats(events: Dataset[UserEvent]): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStat, UserStat](
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[UserEvent], st: GroupState[UserStat]) =>
          val prev = st.getOption.getOrElse(UserStat(uid, 0L, Long.MinValue, 0.0))
          var n = prev.n_events
          var lastUs = prev.last_epoch_us
          var last = prev.last_value
          evs.foreach { e =>
            n += 1
            val us = epochMicros(e.ts)
            if (us > lastUs || (us == lastUs && e.value > last)) {
              lastUs = us; last = e.value
            }
          }
          val next = UserStat(uid, n, lastUs, last)
          st.update(next)
          next
      }
  }

  /** Full-precision epoch µs from a Timestamp (getTime alone is ms). */
  def epochMicros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Sessionization via `flatMapGroupsWithState` — the multi-row-output
    * custom-state surface (`mapGroupsWithState` above is the single-row
    * one). State carries the OPEN session across invocations; each call
    * folds the group's events in event-time order, emitting every session
    * closed by a gap > `gapUs` and keeping the still-open tail in state.
    * In batch mode the function runs once per key with the complete
    * group, so the final open session is emitted too (input is complete
    * by definition) — which is what makes the result oracle-checkable.
    *
    * Scale note: this sorts each user's events in executor memory — the
    * right tool when per-key volume is bounded (true for user sessions);
    * unbounded keys should use the one-shuffle window sessionizer
    * (`x_sessionize`) or streaming `session_window`
    * (`st_stream_session`). Value sums accumulate as 2-dp BigDecimal so
    * they are exact and order-independent, matching the oracle's
    * decimal-exact SUM. */
  def sessionsViaCustomState(events: Dataset[UserEvent],
                             gapUs: Long): Dataset[SessionOut] = {
    // batch-only: emitting the open tail AND storing it would duplicate
    // sessions across microbatches on a real stream — there, use
    // session_window (st_stream_session) instead
    require(!events.isStreaming,
      "sessionsViaCustomState is the batch custom-state surface; " +
        "streaming sessionization is StreamIngest via session_window")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[UserEvent],
         st: GroupState[OpenSession]) =>
          val sorted = evs.toArray.sortBy(e => (epochMicros(e.ts), e.value))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var open = st.getOption.orNull
          sorted.foreach { e =>
            val us = epochMicros(e.ts)
            if (open == null) {
              open = OpenSession(uid, us, us, 1L, scaled(e.value))
            } else if (us - open.end_us > gapUs) {
              out += closed(open)
              open = OpenSession(uid, us, us, 1L, scaled(e.value))
            } else {
              open = open.copy(end_us = us, n_events = open.n_events + 1,
                sum_scaled = open.sum_scaled + scaled(e.value))
            }
          }
          if (open != null) {
            st.update(open) // streaming would hold this for the next batch
            out += closed(open) // batch: input complete → emit the tail
          }
          out.iterator
      }
  }

  /** 2-dp fixed-point cents: exact, order-independent accumulation. */
  private def scaled(v: Double): Long = math.round(v * 100.0)
  private def closed(o: OpenSession): SessionOut =
    SessionOut(o.user_id, o.start_us, o.end_us, o.n_events,
      o.sum_scaled / 100.0)
}

/** Open-session state for [[StreamIngest.sessionsViaCustomState]]. */
final case class OpenSession(user_id: Long, start_us: Long, end_us: Long,
                             n_events: Long, sum_scaled: Long)
final case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
                            n_events: Long, sum_value: Double)

final case class UserEvent(user_id: Long, ts: java.sql.Timestamp,
                           value: Double)
final case class UserStat(user_id: Long, n_events: Long, last_epoch_us: Long,
                          last_value: Double)
