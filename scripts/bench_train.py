#!/usr/bin/env python
"""Training-throughput benchmark: DWT-Var fine-tune step on TPU.

Measures steps/s and images/s for the reference's variance-head fine-tune
workload (ref: train_openai.py:90-97 — dual NLL loss, spatial + DWT domain,
through the full 93.6M-param FFHQ-256 ADM UNet, ref config
configs/train_ffhq_dwt.json: batch 1 per device, Adam) end-to-end on one
chip: forward + backward + Adam update + EMA, jitted as one program.

Run: python scripts/bench_train.py [--size 256] [--batches 1 2 4]
Prints one JSON line per batch size.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--per-sample-map", action="store_true")
    args = p.parse_args()

    from kdip_tpu import diffusion, train, utils
    from kdip_tpu.models import adm
    from kdip_tpu.ops.transforms import OrthoTransform

    size = args.size
    unet = adm.ffhq_unet(dtype=jnp.bfloat16)
    model = adm.ADMUNetV2(unet=unet)
    params = model.init(jax.random.key(0), jnp.zeros((1, size, size, 3)),
                        jnp.zeros((1,)))["params"]
    n_par = utils.n_params(params)
    tables = diffusion.make_diffusion(1000, "linear")
    ortho_tf = OrthoTransform("dwt")

    def model_apply_v2(p_, x, t):
        return model.apply({"params": p_}, x, t, deterministic=True)

    def loss_fn(p_, x0, noise, sigma):
        return train.openai_v2_loss(model_apply_v2, p_, x0, noise, sigma,
                                    tables.log_sigmas, ortho_tf)

    optimizer = optax.adam(1e-5)
    density = lambda key, shape: jnp.exp(
        jax.random.normal(key, shape) * 1.2 - 1.2)
    step_fn = jax.jit(train.make_train_step(loss_fn, optimizer, density,
                                            per_sample_map=args.per_sample_map),
                      donate_argnums=(0,))

    for b in args.batches:
        state = train.create_train_state(params, optimizer)
        batch = jax.random.normal(jax.random.key(1), (b, size, size, 3))
        state, m = step_fn(state, batch, jax.random.key(2), 0.999)
        jax.block_until_ready(state)  # compile + warmup
        t0 = time.time()
        for i in range(args.iters):
            state, m = step_fn(state, batch, jax.random.key(3 + i), 0.999)
        jax.block_until_ready(state)  # wait for the full update chain
        dt = (time.time() - t0) / args.iters
        assert bool(jnp.isfinite(m["loss"])), "non-finite loss"

        print(json.dumps({
            "workload": f"dwt-var fine-tune step, {size}px, "
                        f"{n_par/1e6:.1f}M params, bf16"
                        + (", per-sample-map" if args.per_sample_map else ""),
            "batch": b, "ms_per_step": round(dt * 1e3, 2),
            "images_per_sec": round(b / dt, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
