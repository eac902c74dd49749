package graft.plans

/** The k-slot insertion board shared by [[TfidfTopTerms]] and
  * [[Bm25TopTerms]] — THE exactness-critical selection law, spelled
  * once (r18 verdict item 3): candidates arrive in term-ASC order (the
  * [[TermHistogram]] output order) and are inserted with a STRICT
  * `score >` displacement rule, so an equal-score later term never
  * passes an earlier one and the board reads exactly
  * (score DESC, term ASC) — the row_number window's order,
  * bit-compatible with the DuckDB oracle.
  *
  * Score comparison stays in each operator's NATIVE score type (Long
  * for tfidf, Double for bm25) behind the abstract `candBeats`:
  * converting either type to the other can merge or split ties past
  * 2^53 and silently change the tie-break. The two concrete boards are
  * the only call sites, so the JVM devirtualizes the comparison
  * (bimorphic inline) and the loop stays as tight as the previously
  * duplicated spellings. */
abstract class TopKBoard(val k: Int) {
  /** slots filled so far (≤ k), in (score DESC, term ASC) order */
  var cnt = 0

  /** does the STAGED candidate's score strictly beat slot `i`'s? */
  protected def candBeats(i: Int): Boolean

  /** copy slot `from`'s payload (term, tf, score, …) to slot `to` */
  protected def moveSlot(from: Int, to: Int): Unit

  /** write the staged candidate's payload into slot `i` */
  protected def writeSlot(i: Int): Unit

  /** Offer the staged candidate (the law — one spelling): no-op when
    * the board is full and the candidate does not strictly beat the
    * last slot; otherwise displace strictly-beaten slots only. */
  final def offer(): Unit = {
    if (cnt < k || candBeats(k - 1)) {
      var ins = math.min(cnt, k)
      while (ins > 0 && candBeats(ins - 1)) ins -= 1
      if (ins < k) {
        var q = math.min(cnt, k - 1)
        while (q > ins) {
          moveSlot(q - 1, q)
          q -= 1
        }
        writeSlot(ins)
        if (cnt < k) cnt += 1
      }
    }
  }
}
