package graft.queries

import graft.SparkSpec

/** Empirical Johnson–Lindenstrauss check for `x_rand_projection`: the
  * 64→16 projection must positively preserve pairwise L2 structure. The
  * fixture's embeddings are near-random (pairwise distances concentrate),
  * which is the HARD case for JL — correlation is honest-modest there,
  * so the gate is a loose positive bound and the measured value is
  * reported for the record. */
class JlProjectionSpec extends SparkSpec {

  test("projected distances correlate positively with original distances") {
    import org.apache.spark.sql.functions._
    val proj = graft.SparkEntry.queries("x_rand_projection")(spark, sf)
    val cols = proj.columns.filter(_.startsWith("proj_"))
    assert(cols.length === 16)
    val p = proj.collect().map(r =>
      r.getLong(0) -> cols.indices.map(i => r.getDouble(i + 1)).toArray)
      .toMap
    val v = graft.tbl(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val ids = v.keys.toSeq.sorted.take(100)
    val pairs = for {
      i <- ids.indices; j <- (i + 1) until ids.length
    } yield (l2(v(ids(i)), v(ids(j))), l2(p(ids(i)), p(ids(j))))
    val (xs, ys) = (pairs.map(_._1), pairs.map(_._2))
    def corr(a: Seq[Double], b: Seq[Double]): Double = {
      val (ma, mb) = (a.sum / a.size, b.sum / b.size)
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      val (sa, sb) = (math.sqrt(a.map(x => (x - ma) * (x - ma)).sum),
        math.sqrt(b.map(x => (x - mb) * (x - mb)).sum))
      cov / (sa * sb)
    }
    val c = corr(xs, ys)
    info(f"distance correlation over ${pairs.size} pairs: $c%.3f")
    assert(c > 0.15, f"JL projection lost distance structure: corr=$c%.3f")
    // non-degenerate: every projected dimension varies
    for (i <- cols.indices) {
      val col_i = p.values.map(_(i)).toSeq
      assert(col_i.distinct.size > 1, s"proj_$i is constant")
    }
  }
}
