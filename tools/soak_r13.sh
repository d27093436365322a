#!/bin/bash
# Round-13 scale-curve soak (VERDICT r12 #1): the ZIPF-DEGREE axis —
# every prior exponent was measured at ScaleSynth's constant per-user
# degree, while the pair engine's fan-out is quadratic in degree. The
# zipf ops rekey a deterministic 1/31 interaction slice to Zipf(s=1)
# users (max degree grows with sf): the uncapped op documents the
# super-linear wall, the capped ops run the production posture
# (capUserDegree 64). Plus the duplicate-CLUSTER-size skew analog for
# the dedup chain (dedup_megacluster) and the fixed-delta incremental
# near-dup refresh against the persisted standing bucket frame.
#
# The uncapped zipf op runs in its OWN JVM per scale point so a blowup
# cannot lose the capped ops' line; sf3 runs 2 reps (the r11/r12
# convention). JVM_MEM 40g per the r12 note (96g inflated walls).
# Usage: tools/soak_r13.sh [out-file]   (scale dirs from ScaleSynth)
set -e
OUT=${1:-/root/repo/SOAK_r13.json}
CAPPED=cosine_topk_zipf_capped,jaccard_topk_zipf_capped,itemknn_scores_zipf_capped,dedup_megacluster,incremental_neardup_refresh
run () { # sf-dir reps ops
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 JVM_MEM=40g \
    SPARK_GRAFT_SOAK_REPS=$2 SPARK_GRAFT_SOAK_ONLY=$3 \
    SPARK_GRAFT_SOAK_OUT=$OUT \
    /root/repo/tools/run.sh graft.Soak > /dev/null
}
for sf in /root/testdata/sf0.1 /tmp/scale/sf0.3 /tmp/scale/sf1; do
  echo "=== soak $sf (capped tier) ==="
  run $sf 3 $CAPPED
  echo "=== soak $sf (zipf uncapped, own JVM) ==="
  run $sf 3 cosine_topk_zipf_uncapped
done
echo "=== soak /tmp/scale/sf3 (capped tier) ==="
run /tmp/scale/sf3 2 $CAPPED
echo "=== soak /tmp/scale/sf3 (zipf uncapped, own JVM) ==="
run /tmp/scale/sf3 2 cosine_topk_zipf_uncapped
python3 /root/repo/tools/soak_exponents.py $OUT
