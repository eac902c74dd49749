package graft.queries

import java.nio.file.{Files, Paths}

/** Round-12 oracle dev dump (not a spec — run with
  * `sbt "Test/runMain graft.queries.H3OracleSqlDump <outDir>"`): writes
  * each H3 oracle SQL to a file so `tools/check.py`-style DuckDB runs
  * can diff them against engine ground truth while iterating. */
object H3OracleSqlDump {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/oracle_dev"
    new java.io.File(out).mkdirs()
    def w(name: String, sql: String): Unit = {
      Files.writeString(Paths.get(s"$out/$name.sql"), sql)
      println(s"wrote $out/$name.sql (${sql.length} chars)")
    }
    // generated res-9 forward over the zone centroids — must match the
    // handwritten f6 value-for-value
    val genF6 =
      s"""WITH ${H3OracleGen.constCtes},
         |pt AS (
         |  SELECT n_nationkey AS zone_id,
         |         (n_nationkey * 0.5 - 6.0) / 180.0 * pi() AS phi,
         |         (n_nationkey * 1.5 - 18.0) / 180.0 * pi() AS lam
         |  FROM nation
         |)${H3OracleGen.forward("pt", 9, Seq("zone_id"), "fwd")}
         |SELECT zone_id, lower(hex(h)) AS h3_9 FROM fwd ORDER BY zone_id"""
        .stripMargin
    w("gen_f6", genF6)
    w("old_f6", H3OracleSql.f6)
    // raw fragments for python-side glue prototyping
    w("frag_consts", H3OracleGen.constCtes)
    for (r <- Seq(3, 5, 7, 9, 11, 13, 15))
      w(s"frag_fwd$r",
        H3OracleGen.forward("psrc" + r, r, Seq("zone_id", "gx", "gy"), "pcell" + r))
    // generated res-5 / res-3 forwards (ring + spatial-join anchors)
    for (r <- Seq(3, 5)) {
      val q =
        s"""WITH ${H3OracleGen.constCtes},
           |pt AS (
           |  SELECT n_nationkey AS zone_id,
           |         (n_nationkey * 0.5 - 6.0) / 180.0 * pi() AS phi,
           |         (n_nationkey * 1.5 - 18.0) / 180.0 * pi() AS lam
           |  FROM nation
           |)${H3OracleGen.forward("pt", r, Seq("zone_id"), "fwd")}
           |SELECT zone_id, lower(hex(h)) AS cell FROM fwd ORDER BY zone_id"""
          .stripMargin
      w(s"gen_anchor$r", q)
    }
  }
}
