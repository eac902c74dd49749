package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the Misra-Gries summary: the superset guarantee
  * (every key above n/(m+1) survives) must hold under any interleaving
  * of reduce and merge — that is exactly what makes the two-pass
  * heavy-hitters operator's output independent of Spark's partitioning.
  */
class MisraGriesSpec extends AnyFunSuite {

  private def run(agg: MisraGriesAggregator, parts: Seq[Seq[String]])
      : Set[String] =
    agg.finish(parts.map(_.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge)).toSet

  test("superset guarantee: keys above n/(m+1) survive any partitioning") {
    val m = 8
    val agg = new MisraGriesAggregator(m)
    val keyGen = Gen.frequency(
      (40, Gen.const("hot")), (10, Gen.const("warm")),
      (50, Gen.choose(0, 200).map("tail" + _)))
    val prop = Prop.forAll(
      Gen.listOfN(400, keyGen), Gen.choose(1, 8)) { (keys, nParts) =>
      val hh = run(agg, keys.grouped(keys.length / nParts + 1).toSeq)
      val n = keys.length
      val counts = keys.groupBy(identity).view.mapValues(_.size)
      counts.filter { case (_, c) => c.toLong * (m + 1) > n }
        .keys.forall(hh.contains)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("summary never exceeds m keys and eviction actually fires") {
    val m = 4
    val agg = new MisraGriesAggregator(m)
    val stream = (1 to 100).map("k" + _) // all distinct: constant eviction
    val buf = stream.foldLeft(agg.zero)(agg.reduce)
    assert(buf.size <= m)
    val merged = agg.merge(buf,
      (101 to 200).map("k" + _).foldLeft(agg.zero)(agg.reduce))
    assert(merged.size <= m)
  }

  test("exact below capacity: no eviction, counts are true counts") {
    val agg = new MisraGriesAggregator(8)
    val buf = Seq("a", "b", "a", "c", "a", "b")
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    assert(agg.finish(buf).toSeq === Seq("a", "b", "c"))
  }
}
