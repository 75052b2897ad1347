#!/bin/bash
# DWT-Var fine-tune (equivalent of reference quick_start/dwt_var/train_openai.sh;
# the slurm 8-GPU launch becomes the dp mesh inside one process).
python -m kdip_tpu.cli.train_openai \
    --config configs/train_ffhq_dwt.json \
    --checkpoint "${CHECKPOINT:-../model_zoo/diffusion_ffhq_10m.pt}" \
    --batch-size 96 --lr 1e-4 \
    --logdir runs/train_openai/dwt_var
