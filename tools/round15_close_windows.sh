#!/bin/bash
# Round-15 closing windows on the final tree (42-query headline set).
set -x
cd /root/repo
SPARK_GRAFT_SF_DIR=target/sf10 SPARK_GRAFT_BENCH_SAMPLES=2 \
  SPARK_GRAFT_BENCH_SCHEDULE=interleave \
  SPARK_GRAFT_BENCH_EXCLUDE=x_embed_neardup \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf10c.log 2>&1
cp target/bench_full.json /tmp/bench_full_sf10c.json
echo "SF10 CLOSE DONE rc=$?"
SPARK_GRAFT_SF_DIR=target/sf1 SPARK_GRAFT_BENCH_SAMPLES=3 \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf1c.log 2>&1
cp target/bench_full.json /tmp/bench_full_sf1c.json
echo "SF1 CLOSE DONE rc=$?"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf01c.log 2>&1
cp target/bench_full.json /tmp/bench_full_sf01c.json
echo "SF01 CLOSE DONE rc=$?"
echo "ALL CLOSE WINDOWS DONE"
