#!/usr/bin/env python3
"""Render the PLANS.md scale table from paired Spark/DuckDB bench JSONs.

Usage: python3 tools/scaletable.py <spark_sf01> <duck_sf01> <spark_sf1> <duck_sf1>
"""
import json
import sys


def load(p):
    return json.load(open(p))


def main(s01p, d01p, s1p, d1p):
    s01, d01, s1, d1 = load(s01p), load(d01p), load(s1p), load(d1p)
    names = sorted(s01["queries"])
    print("| query | Spark sf0.1 | DuckDB sf0.1 | ratio | "
          "Spark sf1 | DuckDB sf1 | ratio |")
    print("|---|---|---|---|---|---|---|")
    for n in names:
        a, b = s01["queries"][n], d01["queries"][n]
        c, d = s1["queries"][n], d1["queries"][n]
        print(f"| `{n}` | {a:.2f} | {b:.2f} | {a / b:.2f}× "
              f"| {c:.2f} | {d:.2f} | {c / d:.2f}× |")
    ta, tb = sum(s01["queries"].values()), sum(d01["queries"].values())
    tc, td = sum(s1["queries"].values()), sum(d1["queries"].values())
    print(f"| **total** | **{ta:.1f}** | **{tb:.1f}** | **{ta / tb:.2f}×** "
          f"| **{tc:.1f}** | **{td:.1f}** | **{tc / td:.2f}×** |")


if __name__ == "__main__":
    main(*sys.argv[1:5])
