package graft.ops

import scala.collection.mutable

/** Driver-resident BPE merge training over a word-type frequency table —
  * the scale arm for production merge counts (ref: Sennrich et al. 2016
  * and every production tokenizer trainer).
  *
  * Why this exists: the distributed trainer in `TrainPrepQueries` runs
  * one Spark job per merge round (a full pair-count aggregation + top-1),
  * which is the right shape for a handful of merges but untenable at a
  * production vocabulary (30k merges = 30k jobs). The standard fix is a
  * two-stage split the Zipf distribution makes safe:
  *
  *   1. ONE distributed pass builds the (word-type, corpus frequency)
  *      table — the only part that touches the corpus. At 100 TB the
  *      word-TYPE table is still MBs (vocabulary grows ~log of corpus).
  *   2. The merge loop runs driver-resident over that table with
  *      INCREMENTAL pair-count maintenance: a pair→words index, and on
  *      each merge only the words containing the merged pair get their
  *      pair counts decremented/re-incremented. Per round the work is
  *      O(words containing the top pair), not O(vocabulary) — this is
  *      what makes 30k rounds minutes, not days.
  *
  * Semantics are IDENTICAL to the distributed path (property-tested in
  * `BpeSpec`): greedy left-to-right non-overlapping merge application,
  * top pair by (count DESC, left, right) — the same deterministic
  * tie-break the DuckDB oracle uses.
  */
object Bpe {

  /** One learned merge: (rank, left symbol, right symbol, pair count). */
  type Merge = (Int, String, String, Long)

  /** Greedy left-to-right non-overlapping merge of (l, r) in `s` —
    * mirrors `TrainPrepQueries.bpeApply` ("aaa" + merge(a,a) → [aa, a]). */
  private[ops] def applyMerge(s: Array[String], l: String,
                              r: String): Array[String] = {
    if (s.length <= 1) return s
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
        out += l + r
        i += 2
      } else {
        out += s(i)
        i += 1
      }
    }
    out.toArray
  }

  private def pairsOf(s: Array[String]): Iterator[(String, String)] =
    if (s.length <= 1) Iterator.empty
    else s.iterator.zip(s.iterator.drop(1))

  /** Learn `merges` BPE merges from a word-type frequency table.
    * Deterministic: ties on count break on (left, right) ascending. */
  def trainLocal(wordFreqs: Seq[(String, Long)], merges: Int): Seq[Merge] = {
    // word state: symbol sequences + frequencies, index-addressed
    val syms = wordFreqs.map { case (w, _) =>
      w.map(_.toString).toArray }.toArray
    val freqs = wordFreqs.map(_._2).toArray

    // pair counts + inverted pair→word-ids index
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def add(p: (String, String), wi: Int, f: Long): Unit = {
      counts.updateWith(p)(c => Some(c.getOrElse(0L) + f))
      where.getOrElseUpdate(p, mutable.Set.empty) += wi
    }
    def sub(p: (String, String), wi: Int, f: Long): Unit =
      counts.updateWith(p) { c =>
        val n = c.getOrElse(0L) - f
        if (n <= 0) { where.remove(p); None } else Some(n)
      }
    syms.indices.foreach { wi =>
      pairsOf(syms(wi)).foreach(p => add(p, wi, freqs(wi)))
    }

    val learned = mutable.ListBuffer.empty[Merge]
    var rank = 1
    while (rank <= merges) {
      // Exhaustion parity with the distributed arm (round-9 advice):
      // bpeLearnDistributed throws "corpus exhausted before merge N"
      // when no pair remains; silently truncating here would make the
      // two "property-proven equal" arms diverge on small corpora.
      require(counts.nonEmpty, s"corpus exhausted before merge $rank")
      // top pair by (count DESC, l ASC, r ASC) — the oracle's tie-break.
      // A linear scan of the pair map per round; a heap would be faster
      // still, but the pair map is vocabulary-alphabet-sized and this
      // scan is not the bottleneck at 30k merges.
      val ((l, r), cnt) = counts.min(Ordering.by[
        ((String, String), Long), (Long, String, String)] {
        case ((pl, pr), c) => (-c, pl, pr)
      })
      learned += ((rank, l, r, cnt))
      // incremental update: ONLY words containing (l, r) change
      val affected = where.getOrElse((l, r), mutable.Set.empty).toArray
      affected.foreach { wi =>
        val f = freqs(wi)
        val before = syms(wi)
        pairsOf(before).foreach(p => sub(p, wi, f))
        val after = applyMerge(before, l, r)
        syms(wi) = after
        pairsOf(after).foreach(p => add(p, wi, f))
      }
      rank += 1
    }
    learned.toSeq
  }
}
