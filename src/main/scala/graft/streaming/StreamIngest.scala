package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}

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
}

final case class UserEvent(user_id: Long, ts: java.sql.Timestamp,
                           value: Double)
final case class UserStat(user_id: Long, n_events: Long, last_epoch_us: Long,
                          last_value: Double)
