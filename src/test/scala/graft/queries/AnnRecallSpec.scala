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

  test("PQ answers every query; recall@3 vs exact-L2 truth is reported") {
    import org.apache.spark.sql.functions._
    // PQ ranks by (approximate) L2, so ground truth is exact L2 top-3 —
    // the cosine truth the other tests use would measure the wrong thing
    // on unnormalized embeddings
    val emb = graft.tbl(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val d = sqrt(aggregate(
      zip_with(col("qv"), col("cv"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x))
    val rn = org.apache.spark.sql.functions.row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("query_id")
        .orderBy(round(d, 6), col("neighbor_id")))
    val exact = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .crossJoin(emb.select(col("vec_id").as("neighbor_id"),
        col("v").as("cv")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("rn", rn)
    val truth = top3(exact)
    val pq = top3(graft.SparkEntry.queries("x_ann_pq")(spark, sf))
    val r = recallAt3(pq, truth)
    info(f"PQ (untrained codebooks, 4x16) recall@3 vs exact L2: $r%.3f")
    assert(pq.size === 10, "PQ must answer every query")
    assert(r > 0.0, "PQ recall collapsed to zero — codes carry no signal")
  }

  test("trained-codebook PQ answers every query; recall reported vs untrained") {
    import org.apache.spark.sql.functions._
    val emb = graft.tbl(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val d = sqrt(aggregate(
      zip_with(col("qv"), col("cv"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x))
    val rn = org.apache.spark.sql.functions.row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("query_id")
        .orderBy(round(d, 6), col("neighbor_id")))
    val exact = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .crossJoin(emb.select(col("vec_id").as("neighbor_id"),
        col("v").as("cv")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("rn", rn)
    val truth = top3(exact)
    val untrained = top3(graft.SparkEntry.queries("x_ann_pq")(spark, sf))
    val trained =
      top3(graft.SparkEntry.queries("x_ann_pq_kmeans")(spark, sf))
    val (r0, r1) =
      (recallAt3(untrained, truth), recallAt3(trained, truth))
    info(f"PQ recall@3 vs exact L2: untrained=$r0%.3f trained=$r1%.3f")
    assert(trained.size === 10, "trained PQ must answer every query")
    assert(r1 > 0.0, "trained PQ recall collapsed to zero")
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
