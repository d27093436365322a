#!/bin/bash
# Round-12 scale-curve soak (VERDICT r11 #3 + re-record of the lost
# r12 batch-op points): the heavy model tiers at FOUR scale points
# (the broadcast-or-shuffle flip class the sf3 dedup finding exposed
# is invisible at three), plus the fixed-batch residual-ANN serving
# op whose first recording was lost with /tmp.
#
# JVM_MEM stays at 40g: a first attempt at 96g reproduced the exact
# shuffle bytes/records but inflated pagerank walls 3-4x with
# rep-over-rep growth (old-gen bloat + page-cache pressure on the
# shuffle spill path) — the movement numbers are heap-invariant, the
# walls are not.  sf3 runs 2 reps (the r11 convention) and pagerank
# runs in its own JVM there so an OOM cannot lose the other ops' line.
# Usage: tools/soak_r12.sh [out-file]   (scale dirs from ScaleSynth)
set -e
OUT=${1:-/root/repo/SOAK_r12.json}
OPS=pagerank_full,mfbpr_epoch,ials_fit,lifecycle_earlystop,ann_ivf_pq_residual_batch
run () { # sf-dir reps ops
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 JVM_MEM=40g \
    SPARK_GRAFT_SOAK_REPS=$2 SPARK_GRAFT_SOAK_ONLY=$3 \
    SPARK_GRAFT_SOAK_OUT=$OUT \
    /root/repo/tools/run.sh graft.Soak > /dev/null
}
for sf in /root/testdata/sf0.1 /tmp/scale/sf0.3 /tmp/scale/sf1; do
  echo "=== soak $sf ==="
  run $sf 3 $OPS
done
echo "=== soak /tmp/scale/sf3 (model tiers) ==="
run /tmp/scale/sf3 2 mfbpr_epoch,ials_fit,lifecycle_earlystop,ann_ivf_pq_residual_batch
echo "=== soak /tmp/scale/sf3 (pagerank, own JVM) ==="
run /tmp/scale/sf3 2 pagerank_full
python3 /root/repo/tools/soak_exponents.py $OUT
