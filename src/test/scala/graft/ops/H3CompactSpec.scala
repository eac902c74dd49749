package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GeoF, H3}

/** Distributed h3lib `compactCells` ([[H3Compact]]) against the pure
  * kernel ([[H3.compactCells]]) — the distributed form must be
  * EXACTLY the pure form on the same set (merge decisions are
  * ancestor-local, so co-grouping by the span anchor loses nothing),
  * including across multiple span iterations and per-group scoping. */
class H3CompactSpec extends SparkSpec {

  private def toDf(cells: Seq[(Int, String)]) = {
    import spark.implicits._
    cells.toDF("zone_id", "cell")
  }

  private def runCompact(cells: Seq[(Int, String)], res: Int) =
    H3Compact.compact(toDf(cells), "cell", res, Seq("zone_id"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq.sorted

  test("full 2401-descendant set promotes across a whole span " +
      "iteration to the res-5 ancestor") {
    val c5 = H3.cellToParentHex(
      f"${H3.latLngToCell(40.7128, -74.006, 9)}%x", 5)
    val full = H3.cellToChildrenHex(c5, 9).map((1, _)).toSeq
    assert(runCompact(full, 9) === Seq((1, c5)))
  }

  test("distributed compact equals the pure kernel on random partial " +
      "sets, with per-zone scoping") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 5) {
      val sets = (0 until 3).map { z =>
        val lat = math.toDegrees(math.asin(rnd.nextDouble() * 2 - 1))
        val lng = rnd.nextDouble() * 360.0 - 180.0
        val anchor = H3.latLngToCellString(lat, lng, 4)
        val kids = H3.cellToChildrenHex(anchor, 7)
        // keep ~90%: some res-6 sibling sets stay complete, some not
        z -> kids.filter(_ => rnd.nextDouble() < 0.9)
      }
      val input = sets.flatMap { case (z, cells) => cells.map((z, _)) }
      val expected = sets.flatMap { case (z, cells) =>
        H3.compactCellsHex(cells).map((z, _))
      }.sorted
      assert(runCompact(input, 7) === expected, s"trial $trial diverged")
    }
  }

  test("pentagon-rooted sets compact with the 6-child rule") {
    val (_, plat, plng) = H3.pentagonCenters.head
    val pent2 = H3.latLngToCellString(plat, plng, 2)
    assert(H3.isPentagon(java.lang.Long.parseUnsignedLong(pent2, 16)))
    val full = H3.cellToChildrenHex(pent2, 4) // 1 + 5·(49−1)/6 = 41 cells
    assert(full.length === 41)
    assert(runCompact(full.map((9, _)).toSeq, 4) === Seq((9, pent2)))
    // drop the center grandchild: the center child (a pentagon, 6
    // children) stays expanded, the 5 hexagon children promote
    val dropped = full.filter(_ != H3.cellToChildrenHex(pent2, 4).head)
    val viaSpark = runCompact(dropped.map((9, _)).toSeq, 4)
    val viaPure = H3.compactCellsHex(dropped).map((9, _)).toSeq.sorted
    assert(viaSpark === viaPure)
  }

  test("uncompact explodes a mixed-res cover back to uniform res") {
    val c5 = H3.cellToParentHex(
      f"${H3.latLngToCell(51.5074, -0.1278, 9)}%x", 5)
    val kids6 = H3.cellToChildrenHex(c5, 6)
    val cover = Seq((1, c5), (2, kids6.head)) // res 5 and res 6 entries
    val out = H3Compact.uncompact(toDf(cover), "cell", 7, Seq("zone_id"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq.sorted
    val expected = (H3.cellToChildrenHex(c5, 7).map((1, _)) ++
      H3.cellToChildrenHex(kids6.head, 7).map((2, _))).toSeq.sorted
    assert(out === expected)
  }

  test("multi-res join over a compacted cover equals the join over the " +
      "full fine-res cover") {
    // compact preserves the covered cell set exactly, so joining facts'
    // parent chains against the compacted cover must select the same
    // fact/zone pairs as the direct fine-res equi-join — the property
    // x_h3_multires_join's 100 TB shape rests on
    import spark.implicits._
    val wkt = "POLYGON((-0.3 -0.3, 0.3 -0.3, 0.3 0.3, -0.3 0.3, -0.3 -0.3))"
    val fine = GeoF.h3PolyfillScala(wkt, 6)
    assert(fine.length > 7, "fixture polygon too small to compact")
    val cover = H3Compact.compact(
      fine.map((1, _)).toSeq.toDF("zone_id", "cell"), "cell", 6,
      Seq("zone_id"))
    val rnd = new scala.util.Random(41L)
    val facts = (1 to 200).map { i =>
      (i, H3.latLngToCellString(
        rnd.nextDouble() * 0.8 - 0.4, rnd.nextDouble() * 0.8 - 0.4, 6))
    }.toDF("fact_id", "cell6")
    val coverRes = cover
      .select(GeoF.h3Resolution(col("cell")).as("r")).distinct()
    val viaCompact = facts.crossJoin(broadcast(coverRes))
      .select(col("fact_id"), GeoF.h3Parent(col("cell6"), col("r")).as("cell"))
      .join(cover, "cell").select("fact_id", "zone_id")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val direct = facts
      .join(fine.map((1, _)).toSeq.toDF("zone_id", "cell6"), "cell6")
      .select("fact_id", "zone_id")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(viaCompact === direct)
    assert(viaCompact.nonEmpty, "no fact landed in the polygon")
  }

  test("compact plans one shuffle per span iteration, with bounded " +
      "group state") {
    val c5 = H3.cellToParentHex(
      f"${H3.latLngToCell(35.6762, 139.6503, 9)}%x", 5)
    val df = toDf(H3.cellToChildrenHex(c5, 9).map((1, _)).toSeq)
    val compacted = H3Compact.compact(df, "cell", 9, Seq("zone_id"))
    val exchanges = compacted.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // res 9 → anchors 5, 1, 0: three aggregation shuffles (each ≥
    // 7^4× smaller than the last), never a per-level loop of 9
    assert(exchanges.length <= 3 * 2, // partial+final agg pairs max
      s"unexpected shuffle count ${exchanges.length}")
  }
}
