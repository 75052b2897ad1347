#!/usr/bin/env python
"""Monte-Carlo per-sigma posterior variance estimation CLI.

Equivalent of the reference's `analytic_variance.py` (47-149): for each of
`--num-sigmas` Karras sigmas, estimate E||x0 - D(x0 + sigma*eps)||^2 over a
fraction of the dataset, and save {sigmas, mse_list, errors} for the
'analytic' posterior covariance (condition/condition.py:250-256).

Output is a .npz (plus optional torch-compatible .pt when torch is present).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def main(argv=None):
    from ..utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from .. import ckpt, config as kconfig, precond, schedules, train
    from ..data import FolderOfImages

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--num-sigmas", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--resume", action="store_true",
                   help="continue from <logdir>/recon_mse.jsonl (per-sigma "
                        "journal; index-folded keys make the resumed table "
                        "identical to an uninterrupted run)")
    p.add_argument("--per-sample-map", action="store_true",
                   help="lax.map of batch-1 forwards (the v5e-friendly conv "
                        "layout, ~25%% faster per sample at 256px than "
                        "batched forwards — RESULTS.md batch pathology)")
    p.add_argument("--data-fraction", type=float, default=0.01)
    p.add_argument("--logdir", type=str, default="runs/analytic_variance")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    args = p.parse_args(argv)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    config = kconfig.load_config(args.config)
    model_config = config["model"]
    model, tables = kconfig.make_openai_model(model_config, dtype=dtype)
    size = model_config["input_size"][0]

    if os.path.isdir(args.checkpoint):
        params = ckpt.load_checkpoint(args.checkpoint)
    else:
        params = ckpt.convert_adm_state_dict(
            ckpt.load_torch_checkpoint(args.checkpoint))

    def model_apply(p, x_scaled, t):
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (x_scaled.shape[0],))
        out = model.apply({"params": p}, x_scaled, t)
        return out[..., :3]

    denoise = precond.make_discrete_eps_denoiser(model_apply, tables.log_sigmas)

    sigmas = np.asarray(schedules.get_sigmas_karras(
        args.num_sigmas, model_config["sigma_min"], model_config["sigma_max"]))[:-1]

    dataset = FolderOfImages(config["dataset"]["location"], size=size)
    n_use = max(1, int(len(dataset) * args.data_fraction))
    batches = list(dataset.batches(args.batch_size))
    batches = batches[:max(1, n_use // args.batch_size)]

    os.makedirs(args.logdir, exist_ok=True)  # before the journal opens
    out = train.analytic_variance(
        (lambda p, x, s: jax.lax.map(
             lambda xi: denoise(p, xi[None], s)[0], x))
        if args.per_sample_map else
        (lambda p, x, s: denoise(p, x, s)), batches, sigmas,
        jax.random.key(args.seed), params=params,
        journal_path=(os.path.join(args.logdir, "recon_mse.jsonl")
                      if args.resume else None))
    np.savez(os.path.join(args.logdir, "recon_mse.npz"),
             sigmas=np.asarray(out["sigmas"]),
             mse_list=np.asarray(out["mse_list"]),
             errors=np.asarray(out["errors"]))
    try:
        import torch
        torch.save({k: torch.tensor(np.asarray(v)) for k, v in out.items()},
                   os.path.join(args.logdir, "recon_mse.pt"))
    except ImportError:
        pass
    print(f"saved recon_mse for {len(sigmas)} sigmas to {args.logdir}")


if __name__ == "__main__":
    main()
