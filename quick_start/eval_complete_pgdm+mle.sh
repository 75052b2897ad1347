#!/bin/bash
# Complete PGDM + MLE covariance (paper Table 3)
# (equivalent of reference quick_start/eval_complete_pgdm+mle.sh). Usage:
#   eval_complete_pgdm+mle.sh <ffhq|imagenet> <cov>
source "$(dirname "$0")/common.sh"
COV="$2"
GLOBAL_ARGS="--save-img --ode --guidance pgdm+mle --xstart-cov-type ${COV} --config ${CONFIG} --checkpoint ${CHECKPOINT}"
for OP in $OPS; do
    $SAMPLE $GLOBAL_ARGS \
        --operator-config configs/${OP}.yaml \
        --logdir runs/sample_condition/pgdm+mle/${DATASET}/$(opname $OP)/${COV}
done
