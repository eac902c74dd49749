package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.eventsTbl

/** Sketch-driven operators: bounded-memory summaries that replace
  * full-shuffle aggregations at 100 TB, each finished by an exact pass
  * so the operator output is deterministic and oracle-checkable.
  */
object SketchQueries {

  /** Heavy-hitter capacity: MG guarantees a superset of every key with
    * frequency > n/(m+1); the exact-recount threshold n/32 needs
    * m + 1 > 32, and m = 64 leaves slack. The fixture's skewed key
    * domain has 92 distinct keys, so eviction is actually exercised. */
  private val M = 64

  /** The skewed key: 40% of events collapse onto two hot zones, the
    * rest spread over the full user domain — the hot-key shape that
    * breaks uniform-hash joins (see [[ScaleQueries.saltedZoneJoin]]). */
  private def skewKey = concat(lit("z"),
    when(col("user_id") % 10 < 4, col("user_id") % 2)
      .otherwise(col("user_id")).cast("string"))

  private val sqlSkewKey =
    """'z' || CAST(CASE WHEN user_id % 10 < 4 THEN user_id % 2
      |              ELSE user_id END AS VARCHAR)""".stripMargin

  /** Two-pass exact heavy hitters (hot-key detection — the op whose
    * output feeds the salting decision in [[ScaleQueries]]):
    * pass 1 reduces the stream to a ≤ M-entry Misra-Gries candidate
    * summary (mergeable partials, one bounded row to the driver-side
    * plan as a broadcast — never the distinct-key set); pass 2 re-counts
    * ONLY the candidates (broadcast semi-filter, then a tiny exact
    * aggregate) and keeps keys above n/32. MG's superset guarantee
    * makes the two-pass result EXACTLY equal to the full GROUP BY +
    * HAVING the oracle runs — but at scale the first pass never
    * shuffles the long-tail keys, which is the entire point: a plain
    * GROUP BY over a 100 TB skewed domain shuffles billions of
    * distinct keys to find the two that matter. */
  private def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mg = udaf(new graft.functions.MisraGriesAggregator(M),
      org.apache.spark.sql.Encoders.STRING)
    val keys = eventsTbl(s, dir).select(skewKey.as("key"))
    val cands = keys.select(mg(col("key")).as("cands"))
      .select(explode(col("cands")).as("key"))
    val total = keys.agg(count(lit(1)).as("n_total"))
    keys.join(broadcast(cands), Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * 32 > col("n_total"))
      .orderBy(col("cnt").desc, col("key"))
  }

  private val heavyHittersSql =
    s"""WITH k AS (
       |  SELECT $sqlSkewKey AS key FROM events
       |), tot AS (SELECT count(*) AS n_total FROM k)
       |SELECT key, count(*) AS cnt, (SELECT n_total FROM tot) AS n_total
       |FROM k GROUP BY key
       |HAVING count(*) * 32 > (SELECT n_total FROM tot)
       |ORDER BY cnt DESC, key""".stripMargin

  val all: Map[String, QueryDef] = Map(
    "x_heavy_hitters" -> QueryDef(heavyHitters, Some(heavyHittersSql))
  )
}
