#!/bin/bash
# Round-12 scale-curve soak (VERDICT r11 #3 + re-record of the lost
# r12 batch-op points): the heavy model tiers at FOUR scale points
# (the broadcast-or-shuffle flip class the sf3 dedup finding exposed
# is invisible at three), plus the fixed-batch residual-ANN serving
# op whose first recording was lost with /tmp.
# Usage: tools/soak_r12.sh [out-file]   (scale dirs from ScaleSynth)
set -e
OUT=${1:-/root/repo/SOAK_r12.json}
OPS=pagerank_full,mfbpr_epoch,ials_fit,lifecycle_earlystop,ann_ivf_pq_residual_batch
for sf in /root/testdata/sf0.1 /tmp/scale/sf0.3 /tmp/scale/sf1 /tmp/scale/sf3; do
  echo "=== soak $sf ==="
  SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_CPUS=32 JVM_MEM=96g \
    SPARK_GRAFT_SOAK_ONLY=$OPS SPARK_GRAFT_SOAK_OUT=$OUT \
    /root/repo/tools/run.sh graft.Soak > /dev/null
done
python3 /root/repo/tools/soak_exponents.py $OUT
