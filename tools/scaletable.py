#!/usr/bin/env python3
"""Render the PLANS.md scale table from paired Spark/DuckDB bench JSONs.

Usage: python3 tools/scaletable.py <spark_sf01> <duck_sf01> <spark_sf1> <duck_sf1>
"""
import json
import sys


def load(p):
    return json.load(open(p))


def num(qs, n):
    """Seconds for query n, or None if absent (Bench drops failed
    queries) / non-numeric (duckbench records failures as 'ERR …')."""
    v = qs.get(n)
    return v if isinstance(v, (int, float)) else None


def cell(v):
    return f"{v:.2f}" if v is not None else "—"


def ratio(a, b):
    return f"{a / b:.2f}×" if a is not None and b is not None else "—"


def main(s01p, d01p, s1p, d1p):
    s01, d01, s1, d1 = load(s01p), load(d01p), load(s1p), load(d1p)
    engines = [s01["queries"], d01["queries"], s1["queries"], d1["queries"]]
    names = sorted(set().union(*engines))
    print("| query | Spark sf0.1 | DuckDB sf0.1 | ratio | "
          "Spark sf1 | DuckDB sf1 | ratio |")
    print("|---|---|---|---|---|---|---|")
    complete = True
    for n in names:
        a, b, c, d = (num(q, n) for q in engines)
        complete = complete and None not in (a, b, c, d)
        print(f"| `{n}` | {cell(a)} | {cell(b)} | {ratio(a, b)} "
              f"| {cell(c)} | {cell(d)} | {ratio(c, d)} |")
    # totals only over queries every engine completed, else they lie
    full = [n for n in names if all(num(q, n) is not None for q in engines)]
    if not full:
        print("| **total** | — | — | — | — | — | — |")
        return
    ta, tb, tc, td = (sum(num(q, n) for n in full) for q in engines)
    mark = "" if complete else " (complete queries only)"
    print(f"| **total**{mark} | **{ta:.1f}** | **{tb:.1f}** "
          f"| **{ta / tb:.2f}×** "
          f"| **{tc:.1f}** | **{td:.1f}** | **{tc / td:.2f}×** |")


if __name__ == "__main__":
    main(*sys.argv[1:5])
