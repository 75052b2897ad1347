#!/bin/bash
# Paper Table 2 grid: Type-I guidance x 5 covariance types x 4 operators
# (equivalent of reference quick_start/eval_guidance_I.sh).
source "$(dirname "$0")/common.sh"
GLOBAL_ARGS="--save-img --ode --guidance I --config ${CONFIG} --checkpoint ${CHECKPOINT}"
for COV in convert analytic tmpd dps pgdm; do
    for OP in $OPS; do
        $SAMPLE $GLOBAL_ARGS --xstart-cov-type ${COV} \
            --operator-config configs/${OP}.yaml \
            --logdir runs/sample_condition/guidance_I/${DATASET}/$(opname $OP)/${COV}
    done
done
