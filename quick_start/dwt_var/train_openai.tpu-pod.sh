#!/bin/bash
# Multi-host DWT-Var fine-tune launcher — the TPU-pod equivalent of the
# reference's SLURM batch script (ref: quick_start/dwt_var/train_openai.slurm:
# srun over 8 GPU ranks on one DGX node). On TPU the cluster scheduler is the
# pod itself: every TPU-VM worker runs the SAME command, and
# kdip_tpu.parallel.dist.setup_dist auto-detects the pod rendezvous
# (TPU_WORKER_HOSTNAMES / MEGASCALE_COORDINATOR_ADDRESS → one
# jax.distributed.initialize per process), after which the dp/fsdp mesh in
# cli/train_openai spans all hosts' chips over ICI — no srun/MPI.
#
# Usage (from your workstation):
#   gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone="$ZONE" --worker=all \
#     --command="cd ~/kdip_tpu && bash quick_start/dwt_var/train_openai.tpu-pod.sh"
#
# Or on a SLURM-managed CPU/TPU cluster: `srun bash ...` works unchanged —
# setup_dist recognises SLURM_JOB_ID and lets jax's cluster auto-detection
# assign coordinator/ranks.
#
# Each process loads the checkpoint on process 0 only and broadcasts
# (parallel/dist.load_state_dict), mirroring the reference's chunked MPI
# bcast (dist_util.py:54-74). --batch-size is the GLOBAL batch; the train
# loop shards it over the full mesh.
set -euo pipefail
cd "$(dirname "$0")/../.."

python -m kdip_tpu.cli.train_openai \
    --config configs/train_ffhq_dwt.json \
    --checkpoint "${CHECKPOINT:-../model_zoo/diffusion_ffhq_10m.pt}" \
    --batch-size "${BATCH_SIZE:-96}" --lr 1e-4 \
    --logdir runs/train_openai/dwt_var
