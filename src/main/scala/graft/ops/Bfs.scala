package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative frontier BFS — the Pregel pattern: each level joins the
  * current frontier against the edge list (one shuffle on the node key),
  * anti-joins everything already labeled, and localCheckpoints to cut the
  * growing lineage.
  *
  * The loop exits on an EMPTY FRONTIER instead of always scheduling
  * `maxHops` rounds: at 100 TB a dead round is a full edge-list join that
  * produces nothing, so the emptiness probe (a limit-1 scan of the
  * already-materialized checkpoint, not a recompute) pays for itself the
  * first time a component is exhausted before the hop cap. The minimum
  * work to LEARN the frontier is empty is the join that produces it, so a
  * graph whose reach dies at hop k runs k+1 joins, never `maxHops`.
  *
  * Reference behavior (hop-bounded traversal semantics):
  * `/root/reference/taxi_trips_etl_packages/queries/` has no graph
  * surface; this is part of the training-data-pipeline extension set.
  */
object Bfs {

  /** Final labeling plus how many frontier-expansion joins actually ran —
    * observable so tests (and operators) can assert dead rounds are
    * skipped rather than trust the loop bound. */
  final case class Result(dist: DataFrame, roundsRun: Int)

  /** Multi-source hop distances.
    *
    * @param seeds  one column `node`, distinct seed ids (distance 0)
    * @param edges  columns `a`, `b` — directed pairs; pass both
    *               orientations for an undirected graph
    * @param maxHops inclusive hop cap; `dist` ∈ [0, maxHops]
    */
  def distances(seeds: DataFrame, edges: DataFrame, maxHops: Int): Result = {
    var dist = seeds.select(col("node"), lit(0).as("dist")).localCheckpoint()
    var frontier = dist.select("node")
    var rounds = 0
    var empty = frontier.isEmpty
    var hop = 1
    while (hop <= maxHops && !empty) {
      val next = frontier.join(edges, frontier("node") === edges("a"))
        .select(edges("b").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("dist", lit(hop))
        .localCheckpoint() // first discovery == BFS level; cut lineage
      rounds += 1
      empty = next.isEmpty
      if (!empty) {
        // each LEVEL is checkpointed, so their union has flat lineage —
        // checkpointing the union too would be a second eager
        // materialization of every level per round (job-count A/B at
        // sf1: 33 → 30 jobs, 47 → 44 stages for the 3-hop query;
        // wall-clock parity within this host's window noise)
        dist = dist.union(next)
        frontier = next.select("node")
      }
      hop += 1
    }
    Result(dist, rounds)
  }
}
