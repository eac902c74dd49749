package graft.plans

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property check for the custom as-of Catalyst operator: random
  * trade/quote streams vs an in-memory reference, BOTH directions.
  * Right-side (key, time) pairs are generated distinct so the
  * greatest-≤ / smallest-≥ pick is unique and the property is
  * deterministic; left rows carry a unique tag so the comparison is an
  * exact multiset equality. */
class AsOfPropSpec extends SparkSpec {
  import spark.implicits._

  private val streamsGen = for {
    nl <- Gen.choose(0, 40)
    left <- Gen.sequence[List[(Long, Long)], (Long, Long)](
      List.tabulate(nl)(_ => for {
        k <- Gen.choose(0L, 3L)
        t <- Gen.choose(0L, 50L)
      } yield (k, t)))
    nr <- Gen.choose(0, 40)
    rightRaw <- Gen.listOfN(nr, for {
      k <- Gen.choose(0L, 3L)
      t <- Gen.choose(0L, 50L)
    } yield (k, t))
  } yield (left.zipWithIndex.map { case ((k, t), i) => (k, t, s"L$i") },
    rightRaw.distinct.zipWithIndex.map { case ((k, t), i) =>
      (k, t, i.toDouble) })

  private def reference(left: List[(Long, Long, String)],
      right: List[(Long, Long, Double)], backward: Boolean) =
    left.map { case (k, lt, tag) =>
      val cands =
        if (backward) right.filter(r => r._1 == k && r._2 <= lt)
        else right.filter(r => r._1 == k && r._2 >= lt)
      val pick =
        if (cands.isEmpty) None
        else Some(if (backward) cands.maxBy(_._2) else cands.minBy(_._2))
      (k, lt, tag, pick.map(_._2), pick.map(_._3))
    }.sortBy(r => (r._1, r._2, r._3))

  private def engine(left: List[(Long, Long, String)],
      right: List[(Long, Long, Double)], dir: AsOfDirection) =
    graft.ops.AsOf.join(
      left.toDF("k", "lt", "tag"), right.toDF("rk", "rt", "v"),
      Seq("k"), Seq("rk"), "lt", "rt", dir)
      .select("k", "lt", "tag", "rt", "v")
      .as[(Long, Long, String, Option[Long], Option[Double])]
      .collect().toList.sortBy(r => (r._1, r._2, r._3))

  test("both directions equal the in-memory reference on random streams") {
    val prop = Prop.forAllNoShrink(streamsGen) { case (left, right) =>
      val back = engine(left, right, AsOfBackward)
      val fwd = engine(left, right, AsOfForward)
      Prop(back == reference(left, right, backward = true)) :|
        s"backward: got $back" &&
        Prop(fwd == reference(left, right, backward = false)) :|
        s"forward: got $fwd"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
