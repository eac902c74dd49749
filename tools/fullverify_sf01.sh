#!/bin/bash
# Standing full-registry verification at sf0.1 (r17 verdict item 5):
# the driver's correctness gate runs at sf0.01; this re-runs the SAME
# Verify + DuckDB compare over the FULL registry at 10x that SF, which
# is exactly the witness that catches SF-dependent law drift (split
# thresholds, scaled-K laws, planted-text hash laws tuned on the gate
# fixture). Run once per round from /root/repo and commit the artifact:
#
#   tools/fullverify_sf01.sh VERIFY_sf01_r18.json
#
# Exit status is check.py's: 0 iff every registered query hash-matches.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT_JSON="${1:?usage: tools/fullverify_sf01.sh <artifact.json>}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
DUMP_DIR=target/verify_sf01
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt -batch "runMain graft.Verify $SF_DIR $DUMP_DIR" \
  > target/verify_sf01.log 2>&1 || {
    tail -5 target/verify_sf01.log; exit 1; }
grep -c "ok in" target/verify_sf01.log || true
python3 tools/check.py "$SF_DIR" "$DUMP_DIR" --json "$OUT_JSON" | tail -3
