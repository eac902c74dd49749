package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Shared hot-key machinery for the iterative graph operators' two-phase
  * skew joins (round 15, extending the Components treatment of round 14
  * to PageRank's contribution join and BFS's frontier join).
  *
  * The common shape: a FAT stream (edges) joins a key-UNIQUE side (per-
  * node rank / the frontier). A Zipf-degree hub funnels every one of its
  * edge rows into ONE reduce partition of the shuffled join — and AQE's
  * skew split does not apply when the unique side is an inline aggregate
  * or an un-sized LogicalRDD. The fix is detection + split: keys whose
  * fat-side multiplicity (= degree) exceeds a threshold have their
  * unique-side rows broadcast, so the hot rows take a map-side hash join
  * and never enter the shuffle; cold keys keep the stock shuffled join,
  * whose per-key multiplicity is ≤ the threshold by construction.
  *
  * Unlike Components — whose edge set contracts every round and must
  * re-detect per half-round — these operators iterate over a STATIC edge
  * multiset, so detection runs exactly once per call and amortizes over
  * all iterations/levels.
  */
object HotKeys {

  /** Driver-side bound on the broadcast hot-key set — same budget as
    * Components.MaxHotKeys: ~1M (key) rows, a LOUD failure (with the
    * knob named) rather than a silent driver OOM past it. */
  val MaxHotKeys: Int = 1 << 20

  /** Detection-time observability for the skew specs: how many keys take
    * the broadcast arm, and the max degree left in the shuffled (cold)
    * arm — the "no reduce task exceeds the bound" witness. */
  final case class Stats(nHotKeys: Int, maxColdDeg: Long)

  /** Hot keys of a (key, degree) frame, collected under the [[MaxHotKeys]]
    * bound and re-parallelized as a 1-partition frame (so the broadcast
    * arms of every subsequent iteration reuse one driver-local build
    * instead of re-running the degree aggregate). Returns None when no
    * key exceeds the threshold — the caller keeps the stock plan.
    * Fires `observer` with the detection stats (the cold-max aggregate
    * only runs when an observer is installed — it costs one extra tiny
    * scan of the node-grained degree frame). */
  def detect(spark: SparkSession, deg: DataFrame, keyCol: String,
      degCol: String, threshold: Long, what: String,
      observer: Option[Stats => Unit] = None): Option[DataFrame] = {
    val keyed = deg.select(col(keyCol))
    val hot: Array[Row] = deg.filter(col(degCol) > threshold)
      .select(col(keyCol)).limit(MaxHotKeys + 1).collect()
    require(hot.length <= MaxHotKeys,
      s"$what: > $MaxHotKeys keys exceed the hot-key threshold " +
        s"$threshold — raise hotKeyThreshold (or MaxHotKeys) for this graph")
    observer.foreach { obs =>
      val maxCold = deg.filter(col(degCol) <= threshold)
        .agg(coalesce(max(col(degCol)), lit(0L))).head().getLong(0)
      obs(Stats(hot.length, maxCold))
    }
    if (hot.isEmpty) None
    else Some(spark.createDataFrame(
      spark.sparkContext.parallelize(hot.toIndexedSeq, 1), keyed.schema))
  }

  /** `fat ⋈ unique` on `key` with the two-phase hot split. `unique` MUST
    * be key-unique (one row per key — a rank vector, a frontier), so the
    * split is an exact partition of the join output:
    *   - hot fat rows: inner-join against the BROADCAST unique rows of
    *     the hot keys (one map-side join does both the membership filter
    *     and the payload attach);
    *   - cold fat rows: anti-join the broadcast hot keys, then the stock
    *     shuffled join — every surviving key's multiplicity is ≤ the
    *     detection threshold.
    * `hotKeys` is the frame from [[detect]]; None → stock join. */
  def joinFatUnique(fat: DataFrame, unique: DataFrame, key: String,
      hotKeys: Option[DataFrame]): DataFrame = hotKeys match {
    case None => fat.join(unique, key)
    case Some(hk) =>
      val uniqueHot = unique.join(broadcast(hk), key)
      fat.join(broadcast(uniqueHot), key)
        .unionAll(
          fat.join(broadcast(hk), Seq(key), "left_anti").join(unique, key))
  }
}
