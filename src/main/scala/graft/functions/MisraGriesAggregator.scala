package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items summary as a mergeable typed
  * [[Aggregator]] — phase 1 of the two-pass exact heavy-hitters
  * operator (SURVEY.md §7.3 ladder step (b)).
  *
  * The buffer holds ≤ m keys with decremented counts. Classic MG
  * guarantee: any key whose true frequency exceeds n/(m+1) is present
  * in the summary (its counter can be decremented at most n/(m+1)
  * times). Partials merge associatively via the Agarwal et al. rule
  * (sum counts, then subtract the (m+1)-th largest and drop ≤ 0), which
  * preserves the guarantee — so at 100 TB each partition ships ≤ m
  * (key, count) pairs to one reducer instead of its distinct-key set.
  *
  * `finish` returns the CANDIDATE key set only (sorted for
  * determinism): the counts are approximations and never surface —
  * phase 2 re-counts the candidates exactly, so the final operator
  * output is deterministic and oracle-checkable even though the
  * summary itself is order-dependent.
  */
final class MisraGriesAggregator(m: Int)
    extends Aggregator[String, Map[String, Long], Array[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], key: String): Map[String, Long] =
    buf.get(key) match {
      case Some(c) => buf.updated(key, c + 1L)
      case None if buf.size < m => buf.updated(key, 1L)
      case None => // full: decrement every counter, drop the zeros
        buf.flatMap { case (k, v) =>
          if (v > 1L) Some(k -> (v - 1L)) else None
        }
    }

  override def merge(a: Map[String, Long],
                     b: Map[String, Long]): Map[String, Long] = {
    val u = b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (u.size <= m) u
    else {
      // subtract the (m+1)-th largest count from all, keep the positives
      val cut = u.values.toArray.sorted(Ordering[Long].reverse).apply(m)
      u.flatMap { case (k, v) =>
        if (v - cut > 0L) Some(k -> (v - cut)) else None
      }
    }
  }

  override def finish(buf: Map[String, Long]): Array[String] =
    buf.keys.toArray.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
