#!/bin/bash
# Cold 100x recording pipeline: fresh derived dataset dir, then the
# full bench suite at the documented 48g driver heap (BASELINE.md
# round-7 note: the 16g default is sized for sf0.1).
set -u
cd /root/repo
sbt -batch "runMain graft.ScaleGen /root/testdata/sf0.1 /tmp/graft_sf10c 100" \
  > /tmp/scalegen_r9.log 2>&1 || { echo "DONE rc=gen-fail" > /tmp/bench100_cold_r9.done; exit 1; }
SPARK_GRAFT_SF_DIR=/tmp/graft_sf10c SPARK_GRAFT_RUNS=1 SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.Bench" > /tmp/bench100_cold_r9.log 2>&1
echo "DONE rc=$?" > /tmp/bench100_cold_r9.done
