package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE skew-join mechanics: salting ([[SaltSkewSpec]]) is the manual
  * mitigation; this spec proves the session is configured so Spark's
  * adaptive runtime re-plan ALSO handles the shape on its own — a skewed
  * sort-merge join partition is detected at runtime and split
  * (`skew=true` in the final adaptive plan), with identical results.
  * At 100 TB this is the zero-code path for moderate skew; salting stays
  * for the pathological keys AQE's partition-splitting can't reach
  * (single-key hot partitions joined on both sides). */
class AqeSkewJoinSpec extends SparkSpec {

  private val SkewConfs = Map(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32768",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
    "spark.sql.shuffle.partitions" -> "8")

  private def withConfs[T](confs: Map[String, String])(body: => T): T = {
    val prev = confs.keys.map(k =>
      k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime re-plan splits the skewed partition and keeps the answer") {
    withConfs(SkewConfs) {
      import spark.implicits._
      // 90% of the fact rows land on key 3; 16-key dimension
      val fact = spark.range(0, 120000)
        .select(when($"id" % 10 =!= 0, lit(3L)).otherwise($"id" % 16)
          .as("k"), $"id".as("v"))
      val dim = spark.range(0, 16)
        .select($"id".as("k"), concat(lit("d"), $"id").as("tag"))
      val joined = fact.join(dim, "k")
        .groupBy("tag").agg(count(lit(1)).as("n"), sum("v").as("sv"))
        .orderBy("tag")
      val rows = joined.collect()
      // semantics: the hot key's group carries exactly its 108k rows
      // (the id%16 branch only yields even keys, so none add to key 3)
      val hot = rows.find(_.getString(0) == "d3").get
      assert(hot.getLong(1) === 108000L)
      assert(rows.map(_.getLong(1)).sum === 120000L)
      // mechanics: the executed adaptive plan marks the SMJ skew-handled
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"no skew=true in final plan:\n$finalPlan")
    }
  }
}
