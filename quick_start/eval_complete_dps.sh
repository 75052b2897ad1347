#!/bin/bash
# Complete-DPS zeta sweep (equivalent of reference quick_start/eval_complete_dps.sh).
source "$(dirname "$0")/common.sh"
GLOBAL_ARGS="--save-img --ode --guidance dps --xstart-cov-type dps --config ${CONFIG} --checkpoint ${CHECKPOINT}"
for ZETA in 1e0 1e1 1e2 1e3 1e4 1e5; do
    for OP in $OPS; do
        $SAMPLE $GLOBAL_ARGS --zeta ${ZETA} \
            --operator-config configs/${OP}.yaml \
            --logdir runs/sample_condition/dps/${DATASET}/$(opname $OP)/zeta_${ZETA}
    done
done
