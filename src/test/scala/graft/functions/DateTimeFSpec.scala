package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DateTimeFSpec extends SparkSpec {
  import spark.implicits._

  private def daypartOf(ts: String): Option[String] =
    Seq(Timestamp.valueOf(ts)).toDF("ts")
      .select(DateTimeF.daypart(col("ts")).as("d"))
      .as[Option[String]].head()

  test("daypart boundaries match the reference CASE (enrichment_query.py:4-7)") {
    assert(daypartOf("2024-01-01 06:00:00") === Some("Morning"))
    assert(daypartOf("2024-01-01 11:59:59.999") === Some("Morning"))
    assert(daypartOf("2024-01-01 12:00:00") === Some("Noon"))
    assert(daypartOf("2024-01-01 17:59:59.999999") === Some("Noon"))
    assert(daypartOf("2024-01-01 18:00:00") === Some("Evening"))
    assert(daypartOf("2024-01-01 23:59:59") === Some("Evening"))
    assert(daypartOf("2024-01-01 00:00:00") === Some("Night"))
    assert(daypartOf("2024-01-01 05:59:59.999999") === Some("Night"))
  }

  test("daypart no-ELSE NULL edge: sub-second times past 23:59:59") {
    // BigQuery TIME keeps microseconds: (23:59:59, 24:00) hits no branch.
    assert(daypartOf("2024-01-01 23:59:59.5") === None)
    assert(daypartOf("2024-01-01 23:59:59.000001") === None)
  }

  test("timestampDiffMinutes truncates toward zero, both signs (BQ semantics)") {
    val df = Seq(
      ("2024-01-01 00:01:30", "2024-01-01 00:00:00"), // +90s → 1
      ("2024-01-01 00:00:00", "2024-01-01 00:01:30"), // -90s → -1 (not -2)
      ("2024-01-01 00:00:59", "2024-01-01 00:00:00")  // +59s → 0
    ).toDF("a", "b")
      .select(DateTimeF.timestampDiffMinutes(
        col("a").cast("timestamp"), col("b").cast("timestamp")).as("m"))
    assert(df.as[Long].collect().toSeq === Seq(1L, -1L, 0L))
  }

  test("timeOfDay formats as lexicographically ordered HH:mm:ss") {
    val r = Seq(Timestamp.valueOf("2024-01-01 09:05:07")).toDF("ts")
      .select(DateTimeF.timeOfDay(col("ts"))).as[String].head()
    assert(r === "09:05:07")
  }
}
