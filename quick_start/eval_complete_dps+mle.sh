#!/bin/bash
# Complete DPS + MLE covariance, zeta sweep (paper Fig. 4)
# (equivalent of reference quick_start/eval_complete_dps+mle.sh). Usage:
#   eval_complete_dps+mle.sh <ffhq|imagenet> <cov>
source "$(dirname "$0")/common.sh"
COV="$2"
GLOBAL_ARGS="--save-img --ode --guidance dps+mle --xstart-cov-type ${COV} --config ${CONFIG} --checkpoint ${CHECKPOINT}"
for ZETA in 1e0 1e1 1e2 1e3 1e4 1e5; do
    for OP in $OPS; do
        $SAMPLE $GLOBAL_ARGS --zeta ${ZETA} \
            --operator-config configs/${OP}.yaml \
            --logdir runs/sample_condition/dps+mle/${DATASET}/$(opname $OP)/${COV}/zeta_${ZETA}
    done
done
