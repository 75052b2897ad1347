#!/bin/bash
# DWT-Var learned-covariance eval (equivalent of reference
# quick_start/dwt_var/eval_guidance_I.sh).
source "$(dirname "$0")/../common.sh"
CONFIG="configs/test_ffhq_dwt.json"
V2CKPT="${V2CKPT:-../model_zoo/ffhq_dwt.ckpt}"
GLOBAL_ARGS="--save-img --ode --guidance I --v2 --config ${CONFIG} --checkpoint ${V2CKPT}"
for OP in $OPS; do
    $SAMPLE $GLOBAL_ARGS \
        --operator-config configs/${OP}.yaml \
        --logdir runs/sample_condition/dwt_var/guidance_I/${DATASET}/$(opname $OP)
done
