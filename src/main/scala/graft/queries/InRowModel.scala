package graft.queries

import org.apache.spark.sql.{DataFrame, Row}

/** The bounded-collect skeleton shared by the r18 in-row collected-model
  * operators (x_lang_id, x_lm_score, x_lm_bigram, x_tfidf_topterms,
  * x_bm25_topterms, x_decontaminate) — ONE spelling of the cap/fallback
  * law and of the driver-side µ-nat fold, so a future edit cannot
  * desynchronize the six sites (r18 verdict items 3+4; the
  * StrictMath-vs-Math latent-ulp bug the r18 self-review caught is
  * exactly the class this deduplication prevents). */
private[queries] object InRowModel {

  /** Collect a vocabulary/alphabet-bounded model frame for in-row
    * scoring, row-capped: fetches `rowCap + 1` rows (saturating — a
    * `Long.MaxValue` "no cap" sentinel must not wrap `limit` to 0) so
    * an over-cap model is DETECTED, never silently truncated.
    *
    * Returns `None` — and says so LOUDLY on stderr, naming the
    * operator, the cap and the arm chosen — when the model is empty,
    * over the cap, or the cap is non-positive (the dev "disable the
    * in-row arm" switch). The caller must then run its unchanged
    * join-chain arm: at scale this is a silent-looking plan-shape
    * switch from a zero-exchange scan to the full chain, which is why
    * the log line exists (operationally visible, r18 verdict item 4). */
  def boundedCollect(model: DataFrame, rowCap: Long,
      operator: String): Option[Array[Row]] = {
    def fallback(why: String): Option[Array[Row]] = {
      System.err.println(s"[graft] $operator: $why — falling back to " +
        s"the join-chain arm (rowCap=$rowCap)")
      None
    }
    if (rowCap <= 0) return fallback("in-row model collect disabled")
    val rows = model
      .limit((math.min(rowCap, Int.MaxValue - 1L) + 1).toInt).collect()
    if (rows.isEmpty) fallback("collected model is empty")
    else if (rows.length > rowCap)
      fallback(s"collected model exceeds the row cap (> $rowCap rows)")
    else Some(rows)
  }

  /** The µ-nat quantization law, one spelling: floor(ln(num/den)·10⁶)
    * as a Long. floor, not round (Spark's HALF_UP and DuckDB's
    * nearbyint disagree on .5 boundaries; floor of the same IEEE double
    * is identical everywhere), and `StrictMath.log`, not `math.log`
    * (Catalyst's `Log` evaluates StrictMath; the Math.log intrinsic is
    * permitted 1 ulp off fdlibm, which can flip the floor). */
  def muNatLog(num: Double, den: Double): Long =
    math.floor(java.lang.StrictMath.log(num / den) * 1000000.0).toLong
}
