#!/bin/bash
# Round-14 scale-curve soak (VERDICT r13 next #1/#3): extends the
# Zipf-degree axis from the similarity/dedup tier to (a) the WEIGHTED
# pair engine at the new capped posture (the one measured-quadratic
# path left after r13 capped the binary twin) and (b) the model-fit
# and evaluator tiers — ALS block replication, BPR per-sample lookups,
# and the evaluator's per-user remove-seen fan-out are all
# degree-sensitive and were previously soaked at constant degree only.
#
# Same geometry as soak_r13.sh: zipfUrm rekeys a deterministic 1/31
# interaction slice to Zipf(s=1) users, max degree grows with sf; sf3
# runs 2 reps; JVM_MEM 40g. Pass NOBC=1 to re-measure under the
# uniform all-shuffle plan (the r12 plan-flip de-confounder) into a
# separate out file.
# Usage: tools/soak_r14.sh [out-file]   (scale dirs from ScaleSynth)
set -e
OUT=${1:-/root/repo/SOAK_r14.json}
TIER=weighted_cosine_topk_zipf_capped,mfbpr_epoch_zipf,ials_mlfit_zipf,eval_accuracy_zipf
run () { # sf-dir reps ops
  env SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 JVM_MEM=40g \
    SPARK_GRAFT_SOAK_REPS=$2 SPARK_GRAFT_SOAK_ONLY=$3 \
    SPARK_GRAFT_SOAK_OUT=$OUT ${NOBC:+SPARK_GRAFT_SOAK_NOBC=$NOBC} \
    /root/repo/tools/run.sh graft.Soak > /dev/null
}
for sf in /root/testdata/sf0.1 /tmp/scale/sf0.3 /tmp/scale/sf1; do
  echo "=== soak $sf (r14 zipf model/eval tier) ==="
  run $sf 3 $TIER
done
echo "=== soak /tmp/scale/sf3 (r14 zipf model/eval tier) ==="
run /tmp/scale/sf3 2 $TIER
python3 /root/repo/tools/soak_exponents.py $OUT
