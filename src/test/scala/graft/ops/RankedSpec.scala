package graft.ops

import graft.SparkSpec

class RankedSpec extends SparkSpec {
  import spark.implicits._

  test("rank over the deterministic top-k equals global rank restricted to it") {
    // counts: 5, 4, 4, 4, 2 with k=3 cutting INSIDE the count-4 tie group
    val df = Seq(("a", 5L), ("b", 4L), ("c", 4L), ("d", 4L), ("e", 2L))
      .toDF("key", "cnt")
    val r = Ranked.topK(df, "cnt", 3, Seq("key"))
      .select("key", "popularity").as[(String, Int)].collect().toMap
    // global ranks: a→1, {b,c,d}→2; the k=3 cut keeps a,b,c (tie-broken
    // by key) and their ranks must still be the GLOBAL ranks — rank is
    // prefix-determined, every row sorting above the cut is included
    assert(r === Map("a" -> 1, "b" -> 2, "c" -> 2))
  }

  test("rank ties inside the cut share the value with gaps (RANK, not DENSE_RANK)") {
    val df = Seq(("a", 9L), ("b", 9L), ("c", 7L)).toDF("key", "cnt")
    val r = Ranked.topK(df, "cnt", 3, Seq("key"))
      .select("key", "popularity").as[(String, Int)].collect().toMap
    assert(r === Map("a" -> 1, "b" -> 1, "c" -> 3)) // gap after the tie
  }
}
