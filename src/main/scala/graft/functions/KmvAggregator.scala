package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct sketch as a typed [[Aggregator]] — the
  * MERGEABLE form (SURVEY.md §7.3 ladder step (b): custom aggregate
  * function). The window/rank formulation (`w_kmv_distinct`) materializes
  * every distinct hash before ranking; this one keeps a bounded k-array
  * per group and merges partials associatively, so at 100 TB each
  * partition ships k longs to the reducer instead of its distinct set —
  * the sketch contract. Same estimator as the SQL form, hence the same
  * DuckDB oracle: est = (k−1)·2³² / h₍ₖ₎, exact below k.
  *
  * Buffer: ascending sorted array of ≤ k distinct hashes (smallest seen).
  * reduce/merge keep it sorted + distinct; both are O(k) per call.
  */
final class KmvAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Double] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) { // displaces the current max
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // k-smallest of the distinct union of two sorted arrays
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    var last = Long.MinValue
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) {
          val x = a(i); i += 1; x
        } else { val x = b(j); j += 1; x }
      if (v != last || n == 0) { out(n) = v; last = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble
    else {
      val est = (k - 1).toDouble * 4294967296.0 / buf.last.toDouble
      // exactly Spark's round(col, 6): BigDecimal HALF_UP on the double
      BigDecimal(est).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
