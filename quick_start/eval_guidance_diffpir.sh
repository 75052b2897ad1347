#!/bin/bash
# DiffPIR lambda sweep (equivalent of reference quick_start/eval_guidance_diffpir.sh).
source "$(dirname "$0")/common.sh"
GLOBAL_ARGS="--save-img --guidance diffpir --config ${CONFIG} --checkpoint ${CHECKPOINT}"
for LAM in 0.5 1 5 10 50 100; do
    for OP in $OPS; do
        $SAMPLE $GLOBAL_ARGS --lam ${LAM} --xstart-cov-type diffpir \
            --operator-config configs/${OP}.yaml \
            --logdir runs/sample_condition/guidance_diffpir/${DATASET}/$(opname $OP)/lam_${LAM}
    done
done
