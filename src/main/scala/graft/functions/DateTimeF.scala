package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/time scalar surface (SURVEY.md §2.8 F1, F2, F8, F9).
  *
  * All of these stay inside whole-stage codegen (built-in expressions only —
  * no UDFs), so they cost nothing extra at 100 TB.
  */
object DateTimeF {

  /** F1 — `EXTRACT(TIME FROM ts)` (ref `enrichment_query.py:10`).
    * Spark (pre-4.1 surface) has no TIME type; an "HH:mm:ss" string compares
    * lexicographically identically to TIME ordering, which is all the
    * reference does with it (range predicates in the daypart CASE).
    */
  def timeOfDay(ts: Column): Column = date_format(ts, "HH:mm:ss")

  /** Parquet fixtures surface as TIMESTAMP_NTZ (Spark 4 infers NTZ); the
    * epoch-based functions below need TIMESTAMP. With a UTC session the
    * cast preserves the wall clock, so both input types behave alike. */
  private def asLtz(ts: Column): Column = ts.cast("timestamp")

  /** F2 — daypart bucketing CASE (ref `enrichment_query.py:4-7`).
    * Faithful to the reference's no-ELSE CASE: a sub-second pickup in
    * (23:59:59, 24:00) falls through every branch → NULL daypart.
    * Compares on microsecond-of-day (BigQuery TIME keeps microseconds;
    * an "HH:mm:ss" string would truncate 23:59:59.5 to "23:59:59" and
    * mis-classify it as Evening instead of NULL).
    */
  def daypart(ts: Column): Column = {
    val us = pmod(unix_micros(asLtz(ts)), lit(86400000000L)) // micros since midnight
    val H = 3600000000L // one hour in micros
    when(us >= 6 * H && us < 12 * H, "Morning")
      .when(us >= 12 * H && us < 18 * H, "Noon")
      .when(us >= 18 * H && us <= 24 * H - 1000000L, "Evening")
      .when(us < 6 * H, "Night") // no .otherwise — faithful NULL edge
  }

  /** F8 — `date(ts)` (ref `models/tripss.sql:2`). */
  def toDateCol(ts: Column): Column = ts.cast("date")

  /** F9 — `timestamp_diff(t1, t2, MINUTE)` (ref `models/tripss.sql:3`):
    * whole-minute difference truncated toward zero (BigQuery semantics,
    * including negatives). Microsecond epoch preserves BQ's full
    * TIMESTAMP precision (millis would truncate each operand first and
    * misclassify e.g. a 59,999,200 µs gap as a whole minute);
    * cast(double → long) truncates toward zero like BQ.
    */
  def timestampDiffMinutes(t1: Column, t2: Column): Column =
    ((unix_micros(asLtz(t1)) - unix_micros(asLtz(t2))) / 60000000.0)
      .cast("long")
}
