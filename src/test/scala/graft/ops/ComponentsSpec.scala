package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connected(spark, edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("chain collapses to its minimum") {
    // path 5-4-3-2-1: worst case for label flooding, log rounds here
    val got = cc(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)))
    assert(got === Map(2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("two components stay separate; edge orientation is irrelevant") {
    val got = cc(Seq((1L, 2L), (3L, 2L), (10L, 20L), (30L, 20L), (30L, 10L)))
    assert(got === Map(2L -> 1L, 3L -> 1L, 20L -> 10L, 30L -> 10L))
  }

  test("clique, duplicate edges and self-loops are harmless") {
    val got = cc(Seq((7L, 8L), (8L, 7L), (7L, 9L), (8L, 9L), (9L, 9L), (7L, 8L)))
    assert(got === Map(8L -> 7L, 9L -> 7L))
  }

  test("empty edge set yields empty labeling") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("star roots do not appear as non-root rows") {
    val got = cc(Seq((2L, 1L), (3L, 1L)))
    assert(got === Map(2L -> 1L, 3L -> 1L))
  }
}
