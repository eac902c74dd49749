#!/bin/bash
# Round-15 scale windows: sf1 (full set) then sf10 (interleave, demo-embed excluded).
set -x
cd /root/repo
SPARK_GRAFT_SF_DIR=target/sf1 SPARK_GRAFT_BENCH_SAMPLES=3 \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf1.log 2>&1
cp target/bench_full.json /tmp/bench_full_sf1.json
echo "SF1 DONE rc=$?"
sbt -batch "runMain graft.ScaleGen /root/testdata/sf0.1 target/sf10 100" \
  > /tmp/scalegen_sf10.log 2>&1
echo "SF10 GEN DONE rc=$?"
SPARK_GRAFT_SF_DIR=target/sf10 SPARK_GRAFT_BENCH_SAMPLES=2 \
  SPARK_GRAFT_BENCH_SCHEDULE=interleave \
  SPARK_GRAFT_BENCH_EXCLUDE=x_embed_neardup \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf10.log 2>&1
cp target/bench_full.json /tmp/bench_full_sf10.json
echo "SF10 DONE rc=$?"
echo "ALL WINDOWS DONE"
