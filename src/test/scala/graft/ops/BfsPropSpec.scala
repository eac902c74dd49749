package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property check: the distributed frontier BFS must produce exactly the
  * hop labeling an in-memory reference BFS produces on ANY graph — both
  * strategy arms (broadcast frontier and shuffle join, forced via
  * `broadcastRowCap = 0`), multi-source seeds, disconnected pieces,
  * cycles, self-loops, duplicate edges and seeds with no edges at all.
  * The labeling is total-function equality, not spot checks: every
  * reachable node within the hop cap, at its minimal distance, and
  * nothing else. */
class BfsPropSpec extends SparkSpec {
  import spark.implicits._

  private val graphGen = for {
    nNodes <- Gen.choose(1, 24)
    nEdges <- Gen.choose(0, 60)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0, nNodes - 1)
      b <- Gen.choose(0, nNodes - 1)
    } yield (s"n$a", s"n$b"))
    nSeeds <- Gen.choose(1, 4)
    seeds <- Gen.listOfN(nSeeds, Gen.choose(0, nNodes - 1).map(i => s"n$i"))
    maxHops <- Gen.choose(0, 4)
  } yield (edges, seeds.distinct, maxHops)

  /** In-memory multi-source BFS over the undirected view. */
  private def reference(edges: List[(String, String)], seeds: List[String],
      maxHops: Int): Map[String, Int] = {
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds.toSet
    var hop = 1
    while (hop <= maxHops && frontier.nonEmpty) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .diff(dist.keySet)
      dist ++= next.map(_ -> hop)
      frontier = next
      hop += 1
    }
    dist
  }

  test("both BFS arms equal the in-memory reference on random graphs") {
    val prop = Prop.forAllNoShrink(graphGen) { case (edges, seeds, maxHops) =>
      val fwd = edges.toDF("a", "b")
      val und = fwd.union(fwd.select(col("b").as("a"), col("a").as("b")))
      val seedDf = seeds.toDF("node")
      val expect = reference(edges, seeds, maxHops)
      val bcast = Bfs.distances(seedDf, und, maxHops)
        .dist.as[(String, Int)].collect().toMap
      val shuffle = Bfs.distances(seedDf, und, maxHops, broadcastRowCap = 0)
        .dist.as[(String, Int)].collect().toMap
      // cap=3: on these graphs the frontier stays under the cap while the
      // accumulated labeling quickly exceeds it — the MIXED state (frontier
      // broadcast probe + shuffled anti-join against labels) plus per-level
      // arm switching mid-run, which neither pure arm reaches
      val mixed = Bfs.distances(seedDf, und, maxHops, broadcastRowCap = 3)
        .dist.as[(String, Int)].collect().toMap
      // r19 two-frontier anti (`undirected = true`, valid here because
      // `und` carries both orientations): must equal the full-labeled
      // anti on ANY such graph — cycles, dups, multi-seed included —
      // in both the broadcast and the tight-cap mixed regime
      val undTwo = Bfs.distances(seedDf, und, maxHops, undirected = true)
        .dist.as[(String, Int)].collect().toMap
      val undTwoMixed = Bfs.distances(seedDf, und, maxHops,
        broadcastRowCap = 3, undirected = true)
        .dist.as[(String, Int)].collect().toMap
      Prop(bcast == expect) :| s"broadcast arm: got $bcast want $expect" &&
        Prop(shuffle == expect) :| s"shuffle arm: got $shuffle want $expect" &&
        Prop(mixed == expect) :| s"mixed arm (cap=3): got $mixed want $expect" &&
        Prop(undTwo == expect) :| s"undirected arm: got $undTwo want $expect" &&
        Prop(undTwoMixed == expect) :|
          s"undirected mixed arm: got $undTwoMixed want $expect"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
