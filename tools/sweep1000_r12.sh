#!/bin/bash
# Round-12 1000x octave sweep (verdict ask 1): one hash-PASS or a
# disclosed boundary per heavy family, at /tmp/graft_sf100 (600M
# lineitem / 100M events / 5M docs / 2M embeddings).
# Phase 1: stats + streaming + sketch families (hash oracles DuckDB
# can hold). Phase 2 adds the rows-only dedup gates. Heavy items
# (q61, q114, q181) run separately with their own timeouts.
set -u
cd /root/repo
SFD=/tmp/graft_sf100
OUT=/tmp/graft_v1000_r12
export SPARK_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTITIONS=128
QS="q161_cuped,q164_mann_whitney,q87_streaming_upsert,q187_approx_heavy_hitters,q22_dedup_minhash_lsh,q24_dedup_simhash,q186_stream_ivf_index"
sbt -batch "runMain graft.Verify $SFD $OUT $QS" > /tmp/v1000_r12.log 2>&1
rc=$?
python3 tools/selfcheck.py $SFD $OUT > /tmp/sc1000_r12.log 2>&1
echo "DONE verify_rc=$rc" > /tmp/v1000_r12.done
