#!/bin/bash
# Round-14 ials numBlocks sensitivity (VERDICT r12 optional #6,
# deferred r13): the §6.z' saturation-transient diagnosis predicts the
# ials_fit climb window moves with ALS's block count. Fit the
# constant-degree sf3 URM at three block counts via the soak's
# SPARK_GRAFT_IALS_BLOCKS knob; each line in the out file carries the
# block count in its own medians (read them in order 4, 10, 32 —
# later-lines-win merging does not apply, the file is read manually).
# Usage: tools/ials_blocks_r14.sh [out-file]
set -e
OUT=${1:-/root/repo/IALS_BLOCKS_r14.json}
rm -f $OUT
for nb in 4 10 32; do
  echo "=== ials_fit sf3 numBlocks=$nb ==="
  env SPARK_GRAFT_SF_DIR=/tmp/scale/sf3 SPARK_GRAFT_CPUS=32 JVM_MEM=40g \
    SPARK_GRAFT_SOAK_REPS=2 SPARK_GRAFT_SOAK_ONLY=ials_fit \
    SPARK_GRAFT_IALS_BLOCKS=$nb SPARK_GRAFT_SOAK_OUT=$OUT \
    /root/repo/tools/run.sh graft.Soak > /dev/null
done
cat $OUT
