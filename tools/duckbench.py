#!/usr/bin/env python3
"""Dev-only DuckDB comparator: times the bench queries' oracle SQL over a
given sf dir, cold, 32 threads — the same method the round judge uses to
compute the Spark-vs-DuckDB ratio.

Usage: python3 tools/duckbench.py <sfDir> <oracle_sql.json> <benchJson>
  benchJson: a Bench output line/file whose "queries" keys select which
  oracles to time.
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, oracle_path: str, bench_path: str) -> None:
    oracle = json.load(open(oracle_path))
    bench = json.load(open(bench_path))
    names = sorted(bench["queries"].keys())
    con = duckdb.connect()
    con.sql("SET threads TO 32")
    # r17: the two-level semdedup oracle materializes a CTE chain that
    # can brush the default memory limit at sf10 when a Spark JVM is
    # still resident; give DuckDB a disk escape hatch instead of dying
    # (a dead comparator loses the whole paired block).
    os.makedirs("/tmp/duckbench_tmp", exist_ok=True)
    con.sql("SET temp_directory='/tmp/duckbench_tmp'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table dir
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        else:
            continue
        # The driver fixture stores events.ts as physical timestamp[ns];
        # Spark cannot write ns parquet, so a Spark-regenerated scale point
        # (target/sf1) carries it as ns-since-epoch BIGINT. Normalize the
        # view so the same oracle SQL runs at both scale points (graft's
        # eventsTbl does the identical ns-long -> us conversion Spark-side).
        if t == "events":
            typ = con.sql("SELECT typeof(ts) FROM events LIMIT 1").fetchone()
            if typ and typ[0] == "BIGINT":
                # magnitude pin before the ns//1000 rewrite (ADVICE r13):
                # a µs/ms fixture would silently shift every comparator
                lo, hi = con.sql(
                    "SELECT min(ts), max(ts) FROM events").fetchone()
                if lo is None:
                    sys.exit("events table is EMPTY - cannot verify the "
                             "ns-epoch magnitude for the ns//1000 rewrite; "
                             "regenerate the fixture (ADVICE r14: None "
                             "here used to raise TypeError instead of "
                             "this diagnostic)")
                if not (9e17 <= lo and hi <= 8e18):
                    sys.exit(f"events.ts BIGINT range [{lo}, {hi}] is not "
                             "ns-since-epoch; refusing the ns//1000 rewrite")
                con.sql("CREATE OR REPLACE VIEW events AS "
                        f"SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) "
                        f"FROM '{p}/*.parquet'")
    out = {}
    for name in names:
        sql = oracle.get(name)
        if sql is None:
            continue
        t0 = time.time()
        try:
            con.sql(sql).fetchall()
            out[name] = round(time.time() - t0, 3)
        except Exception as e:
            out[name] = f"ERR {e}"
    total = sum(v for v in out.values() if isinstance(v, float))
    print(json.dumps({"total": round(total, 3), "queries": out,
                      "sf": sf_dir}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
