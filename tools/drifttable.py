#!/usr/bin/env python3
"""Render the per-round drift-adjudication table (r17 verdict item 7).

The driver-window headline ratio moves with COMPARATOR drift as much as
with plan changes (r17: 1.34x -> 1.64x purely because DuckDB ran faster
in its window). This table makes the adjudication mechanical: for every
benched query, this round's paired (spark, duck, ratio) next to the
spark/duck DELTAS against the previous round's paired artifact — a plan
regression shows as a spark delta, comparator drift as a duck delta.

Usage: python3 tools/drifttable.py <bench_full_now.json> <bench_full_prev.json>
Both files are Bench's target/bench_full.json artifacts (the
BENCH_sf01_rN.json pattern) with a "duckdb" pairing block.
"""
import json
import sys


USAGE = ("usage: python3 tools/drifttable.py "
         "<bench_full_now.json> <bench_full_prev.json>")


def load(p):
    try:
        d = json.load(open(p))
    except OSError as e:
        sys.exit(f"{p}: cannot read ({e.strerror}) — {USAGE}")
    except json.JSONDecodeError as e:
        sys.exit(f"{p}: not valid JSON ({e}) — {USAGE}")
    if not isinstance(d, dict) or "queries" not in d:
        sys.exit(f"{p}: not a Bench artifact (no \"queries\" block) — "
                 f"{USAGE}")
    duck = d.get("duckdb") or {}
    if "queries" not in duck:
        sys.exit(f"{p}: no duckdb pairing block — run Bench with the "
                 "paired comparator (SPARK_GRAFT_PAIRED unset)")
    return d["queries"], duck["queries"]


def num(qs, n):
    v = qs.get(n)
    return v if isinstance(v, (int, float)) else None


def cell(v, fmt="{:.2f}"):
    return fmt.format(v) if v is not None else "—"


def delta(now, prev):
    if now is None or prev is None:
        return "—"
    d = now - prev
    return f"{d:+.2f}"


def main(now_p, prev_p):
    sn, dn = load(now_p)
    sp, dp = load(prev_p)
    names = sorted(set(sn) | set(sp))
    print("| query | spark | duck | ratio | Δspark vs prev | Δduck vs prev |")
    print("|---|---|---|---|---|---|")
    for n in names:
        a, b = num(sn, n), num(dn, n)
        r = f"{a / b:.2f}×" if a is not None and b and b > 0 else "—"
        print(f"| `{n}` | {cell(a)} | {cell(b)} | {r} "
              f"| {delta(a, num(sp, n))} | {delta(b, num(dp, n))} |")
    full = [n for n in names
            if all(num(q, n) is not None for q in (sn, dn, sp, dp))]
    if not full:
        print("| **total** | — | — | — | — | — |")
        return
    ta, tb = sum(num(sn, n) for n in full), sum(num(dn, n) for n in full)
    tc, td = sum(num(sp, n) for n in full), sum(num(dp, n) for n in full)
    print(f"| **total** | **{ta:.1f}** | **{tb:.1f}** | **{ta / tb:.2f}×** "
          f"| **{ta - tc:+.1f}** | **{tb - td:+.1f}** |")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(USAGE)
    main(sys.argv[1], sys.argv[2])
