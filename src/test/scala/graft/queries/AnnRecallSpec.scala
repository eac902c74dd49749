package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Measured recall of the IVF variants against brute-force ground truth:
  * training the coarse quantizer (k-means) must not lose recall vs the
  * fixed first-K centroids it replaces — the quantitative claim behind
  * shipping `x_ann_ivf_kmeans` as the scale path. */
class AnnRecallSpec extends SparkSpec {

  private def top3(df: DataFrame): Map[Long, Set[Long]] =
    df.filter(org.apache.spark.sql.functions.col("rn") <= 3)
      .select("query_id", "neighbor_id")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  private def recallAt3(ann: Map[Long, Set[Long]],
                        truth: Map[Long, Set[Long]]): Double = {
    val per = truth.map { case (q, t) =>
      ann.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    per.sum / per.size
  }

  test("k-means-trained IVF recall@3 >= fixed-centroid IVF recall@3") {
    val truth = top3(graft.SparkEntry.queries("x_cosine_topk")(spark, sf))
    val fixed = top3(graft.SparkEntry.queries("x_ann_ivf")(spark, sf))
    val trained =
      top3(graft.SparkEntry.queries("x_ann_ivf_kmeans")(spark, sf))
    val (rFixed, rTrained) = (recallAt3(fixed, truth), recallAt3(trained, truth))
    info(f"recall@3: fixed=$rFixed%.3f trained=$rTrained%.3f")
    assert(truth.size === 10) // all query vectors answered by ground truth
    assert(trained.size === 10, "trained IVF must answer every query")
    assert(rTrained >= rFixed,
      f"k-means centroids lost recall: $rTrained%.3f < $rFixed%.3f")
  }
}
