#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate.

Runs DuckDB on oracle_sql.json over the sf parquet tables and compares
against the Verify-dumped parquet results: row count, schema (column
names), and a hash over column-name-sorted, row-sorted values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if isinstance(v, float):
            return repr(v)
        return str(v)

    rows = sorted(
        tuple(cell(v) for v in row) for row in df.itertuples(index=False))
    h = hashlib.md5()
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()


def main(sf_dir: str, out_dir: str, json_out: str = None) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        # Spark-regenerated scale points (target/sf1, target/sf10) store
        # each table as a DIRECTORY of part files, and events.ts as
        # ns-since-epoch BIGINT (Spark cannot write ns parquet) — same
        # normalization duckbench.py applies, so the dev gate runs at
        # regenerated SFs too, not just the driver fixtures.
        if os.path.isdir(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        else:
            continue
        if t == "events":
            typ = con.sql("SELECT typeof(ts) FROM events LIMIT 1").fetchone()
            if typ and typ[0] == "BIGINT":
                # The //1000 rewrite assumes ns epoch longs (Spark cannot
                # write ns parquet, so ScaleGen stores ns as BIGINT). A
                # fixture that ever stored µs or ms would be silently
                # shifted 1000x and every streaming oracle would mismatch
                # with no hint — so pin the magnitude first (ADVICE r13):
                # year-2000..2200 in ns is ~9.5e17..7.3e18.
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
                             "ns-since-epoch (expected ~1e18); refusing the "
                             "ns//1000 rewrite — fix the view for the "
                             "fixture's actual unit")
                src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
                con.sql("CREATE OR REPLACE VIEW events AS "
                        f"SELECT * REPLACE (make_timestamp(ts // 1000) AS ts)"
                        f" FROM {src}")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name, sql in sorted(oracle.items()):
        # dump-existence FIRST: a filtered Verify run dumps a subset but
        # oracle_sql.json always carries every oracle, and running the
        # heavy ones (recursive-CTE components is minutes at sf1+) just
        # to report NO-SPARK-OUTPUT made subset checks unusable at
        # regenerated scale points
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            results[name] = "NO-SPARK-OUTPUT"
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            results[name] = f"ORACLE-ERROR {e}"
            continue
        sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        ok_rows = len(odf) == len(sdf)
        ok_cols = sorted(odf.columns) == sorted(sdf.columns)
        ok_hash = ok_rows and ok_cols and canon(odf) == canon(sdf)
        if ok_hash:
            results[name] = f"OK ({len(sdf)} rows)"
        else:
            results[name] = (f"MISMATCH rows={ok_rows}({len(odf)}/{len(sdf)})"
                             f" cols={ok_cols} hash={ok_hash}")
            if ok_rows and ok_cols:
                o, s = (odf.reindex(sorted(odf.columns), axis=1),
                        sdf.reindex(sorted(sdf.columns), axis=1))
                o = o.sort_values(list(o.columns)).reset_index(drop=True)
                s = s.sort_values(list(s.columns)).reset_index(drop=True)
                for c in o.columns:
                    if list(map(str, o[c])) != list(map(str, s[c])):
                        i = next(j for j in range(len(o))
                                 if str(o[c][j]) != str(s[c][j]))
                        results[name] += (f" col={c} row{i}:"
                                          f" oracle={o[c][i]!r} spark={s[c][i]!r}")
                        break
    bad = 0
    for name, r in sorted(results.items()):
        flag = " " if r.startswith("OK") else "✗"
        bad += 0 if r.startswith("OK") else 1
        print(f"{flag} {name}: {r}")
    print(f"\n{len(results)-bad}/{len(results)} queries match")
    if json_out:
        # standing artifact (r17 verdict item 5): the full-registry
        # at-10x-SF witness goes in-tree as VERIFY_sf01_rN.json instead
        # of living as PLANS prose; failures carry the full status line
        with open(json_out, "w") as f:
            json.dump({
                "sf": sf_dir,
                "n_queries": len(results),
                "n_match": len(results) - bad,
                "failures": {n: r for n, r in sorted(results.items())
                             if not r.startswith("OK")},
            }, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    json_path = None
    args = [a for a in sys.argv[1:]]
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("usage: check.py <sfDir> <outDir> [--json <path>]")
        json_path = args[i + 1]
        del args[i:i + 2]
    if len(args) < 2:
        sys.exit("usage: check.py <sfDir> <outDir> [--json <path>]")
    main(args[0], args[1], json_path)
