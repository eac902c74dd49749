package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tbl
import graft.ops.Components

/** Graph-shaped corpus operators: near-duplicate *cluster resolution*.
  *
  * LSH pair generation ([[ExtQueries]] `x_minhash_lsh_pairs`) yields
  * edges; deduplication needs the transitive closure — if A~B and B~C,
  * all three are one duplicate cluster and a single keeper survives.
  * That closure is connected components over the candidate graph,
  * computed with the O(log² n)-round alternating-star algorithm
  * ([[graft.ops.Components]]) — the piece that turns a pair list into an
  * actionable dedup verdict at 100 TB, where clusters can chain far
  * beyond direct pair reach.
  *
  * Oracle: DuckDB computes the same closure with a recursive CTE
  * (min-label flooding) over the identical candidate-pair CTE chain
  * ([[ExtQueries.lshCandCtes]]) — an independent algorithm arriving at
  * the same fixpoint, which checks the Spark side's contraction logic
  * rather than mirroring it.
  */
object GraphQueries {

  /** Per-document duplicate-cluster assignment: component id = min doc_id
    * reachable through LSH candidate pairs, cluster size, and the
    * keep/drop verdict (keeper = the component minimum). Docs with no
    * near-dup candidates are their own singleton component. */
  private def dedupComponents(s: SparkSession, dir: String): DataFrame = {
    val (_, cand) = ExtQueries.lshCandParts(s, dir)
    val comp = Components.connected(s,
      cand.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val docs = tbl(s, dir, "documents").select(col("doc_id"))
    val labeled = docs
      .join(comp, docs("doc_id") === comp("node"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
    val sizes = labeled.groupBy("component")
      .agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "component")
      .select(col("doc_id"), col("component"), col("cluster_size"),
        (col("doc_id") === col("component")).as("is_keeper"))
      .orderBy("doc_id")
  }

  private val dedupComponentsSql =
    s"""WITH RECURSIVE ${ExtQueries.lshCandCtes},
       |edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM cand
       |  UNION ALL
       |  SELECT doc_b AS u, doc_a AS v FROM cand
       |), reach(node, lbl) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.node = e.v
       |), comp AS (
       |  SELECT node AS doc_id, min(lbl) AS component
       |  FROM reach GROUP BY node
       |), sizes AS (
       |  SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
       |  FROM comp GROUP BY component
       |)
       |SELECT c.doc_id, c.component, s.cluster_size,
       |       c.doc_id = c.component AS is_keeper
       |FROM comp c JOIN sizes s USING (component)
       |ORDER BY doc_id""".stripMargin

  val all: Map[String, QueryDef] = Map(
    "x_dedup_components" -> QueryDef(dedupComponents, Some(dedupComponentsSql),
      bench = true)
  )
}
