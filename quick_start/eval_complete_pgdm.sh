#!/bin/bash
# Complete-PGDM grid (equivalent of reference quick_start/eval_complete_pgdm.sh).
source "$(dirname "$0")/common.sh"
GLOBAL_ARGS="--save-img --ode --guidance pgdm --xstart-cov-type pgdm --config ${CONFIG} --checkpoint ${CHECKPOINT}"
for OP in $OPS; do
    $SAMPLE $GLOBAL_ARGS \
        --operator-config configs/${OP}.yaml \
        --logdir runs/sample_condition/pgdm/${DATASET}/$(opname $OP)
done
