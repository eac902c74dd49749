package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.MediaFrames

/** Semantics + plan shape for the columnar frame-stats operator (the
  * JVM-native mapInArrow slot for multimodal columns). */
class FrameStatsSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def expectedMd5(payload: String): String = {
    val bytes = payload.getBytes(StandardCharsets.UTF_8)
    val flen = math.min(64, bytes.length)
    md5hex(bytes.take(flen).map("%02x".format(_)).mkString)
  }

  test("frame counts, sampling, digest, and null-payload skip") {
    val docs = Seq(
      (1L, Some("a" * 130)),  // 3 frames, 1 sampled
      (2L, Some("xy")),       // 1 frame
      (3L, Some("")),         // 0 frames, NULL digest
      (4L, None: Option[String]), // no payload: skipped entirely
      (5L, Some("b" * 64))    // exactly one full frame
    ).toDF("doc_id", "text")
    val got = MediaFrames.frameStats(docs, "doc_id", "text")
      .as[(Long, Long, Long, Option[String])].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq((1L, 3L, 1L), (2L, 1L, 1L), (3L, 0L, 0L), (5L, 1L, 1L)))
    assert(got.map(_._4).toSeq === Seq(Some(expectedMd5("a" * 130)),
      Some(expectedMd5("xy")), None, Some(expectedMd5("b" * 64))))
  }

  test("binary payloads read identically to their string encoding") {
    val docs = Seq((7L, "frame payload bytes")).toDF("doc_id", "s")
      .select(col("doc_id"), col("s").cast("binary").as("payload"))
    val got = MediaFrames.frameStats(docs, "doc_id", "payload")
      .as[(Long, Long, Long, String)].head()
    assert(got === ((7L, 1L, 1L, expectedMd5("frame payload bytes"))))
  }

  test("plan is columnar directly on the vectorized parquet scan") {
    val df = MediaFrames.frameStats(
      graft.tbl(spark, sf, "documents"), "doc_id", "text")
    df.write.format("noop").mode("overwrite").save()
    val exec = collectFirst(df.queryExecution.executedPlan) {
      case f: FrameStatsExec => f
    }.getOrElse(fail("no FrameStatsExec in plan"))
    assert(exec.supportsColumnar)
    // child is the batched scan itself — no row transition below the
    // operator, and the scan is pruned to exactly (doc_id, text)
    val scan = exec.child
    assert(scan.supportsColumnar,
      s"child must feed columnar batches, got ${scan.nodeName}")
    assert(scan.output.map(_.name) === Seq("doc_id", "text"))
  }

  test("composes under projection: ColumnPruning must not strip the child") {
    // regression: FrameStats.references was empty (all output columns are
    // produced, none referenced), so a Project above it made ColumnPruning
    // rewrite the child to Project(Nil) and planning crashed
    val docs = Seq((1L, "abc"), (2L, "d" * 70)).toDF("doc_id", "text")
    val projected = MediaFrames.frameStats(docs, "doc_id", "text")
      .select("doc_id", "n_frames")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(projected.toSeq === Seq((1L, 1L), (2L, 2L)))
    val withCol = MediaFrames.frameStats(docs, "doc_id", "text")
      .withColumn("big", col("n_frames") > 1)
      .where(col("big")).select("doc_id").as[Long].collect()
    assert(withCol.toSeq === Seq(2L))
  }
}
