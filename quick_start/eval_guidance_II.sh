#!/bin/bash
# Type-II guidance grid (equivalent of reference quick_start/eval_guidance_II.sh).
source "$(dirname "$0")/common.sh"
GLOBAL_ARGS="--save-img --guidance II --config ${CONFIG} --checkpoint ${CHECKPOINT}"
for COV in pgdm convert analytic; do
    for OP in $OPS; do
        $SAMPLE $GLOBAL_ARGS --xstart-cov-type ${COV} \
            --operator-config configs/${OP}.yaml \
            --logdir runs/sample_condition/guidance_II/${DATASET}/$(opname $OP)/${COV}
    done
done
