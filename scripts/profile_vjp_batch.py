#!/usr/bin/env python
"""Root-cause the guided-UNet VJP batch pathology (VERDICT r1, weak #8).

Round-1 RESULTS.md reported the guided vjp at B=4 costing 6.3x B=1 and left
it unexplained. This script measures, in-scan (dispatch-free), per-sample
cost at B in {1, 2, 4} for:
  fwd        — UNet forward only
  vjp        — forward + full backward (the guided-NFE shape)
  vjp_remat  — backward with jax.checkpoint(policy=dots_saveable)
  vjp_map    — lax.map of per-sample VJPs (scan over batch)

Run on the TPU chip:  python scripts/profile_vjp_batch.py [--size 256]
Each variant is one jit program; compiles are 30-400 s each on axon, so the
full run can take ~20-40 min. Prints one JSON line per (variant, batch).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def in_scan_time(step_fn, x0, iters):
    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(lambda c, _: (step_fn(c), None), x, None,
                              length=iters)
        return jnp.sum(out.astype(jnp.float32))

    _ = float(run(x0))  # compile + warmup
    t0 = time.time()
    s = float(run(x0))
    del s
    return (time.time() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--variants", type=str, nargs="+",
                   default=["fwd", "vjp", "vjp_remat", "vjp_map"])
    args = p.parse_args()

    from kdip_tpu.models import adm

    model = adm.ffhq_unet(dtype=jnp.bfloat16)
    size = args.size
    params = model.init(jax.random.key(0), jnp.zeros((1, size, size, 3)),
                        jnp.zeros((1,)))["params"]

    def apply(x):
        t = jnp.full((x.shape[0],), 500.0)
        return model.apply({"params": params}, x, t)

    apply_remat = jax.checkpoint(
        apply, policy=jax.checkpoint_policies.dots_saveable)

    def make_step(variant):
        if variant == "fwd":
            def step(x):
                return apply(x)[..., :3].astype(x.dtype)
        elif variant == "vjp":
            def step(x):
                out, vjp = jax.vjp(apply, x)
                (gx,) = vjp(jnp.ones_like(out))
                return gx
        elif variant == "vjp_remat":
            def step(x):
                out, vjp = jax.vjp(apply_remat, x)
                (gx,) = vjp(jnp.ones_like(out))
                return gx
        elif variant == "vjp_map":
            def one(xi):
                out, vjp = jax.vjp(apply, xi[None])
                (gx,) = vjp(jnp.ones_like(out))
                return gx[0]

            def step(x):
                return jax.lax.map(one, x)
        elif variant.startswith("vjp_map_remat"):
            # per-sample vjp with rematerialization: trade HBM reads of
            # saved activations for recompute FLOPs (fwd is ~85% of the HBM
            # roofline but only ~30% of the bf16 compute roofline, so
            # recompute is near-free if it kills activation traffic)
            policy = {
                "vjp_map_remat": None,  # save nothing, recompute all
                "vjp_map_remat_dots": jax.checkpoint_policies.dots_saveable,
                "vjp_map_remat_nobatch":
                    jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
            }[variant]
            ck = (jax.checkpoint(apply) if policy is None
                  else jax.checkpoint(apply, policy=policy))

            def one(xi):
                out, vjp = jax.vjp(ck, xi[None])
                (gx,) = vjp(jnp.ones_like(out))
                return gx[0]

            def step(x):
                return jax.lax.map(one, x)
        else:
            raise ValueError(variant)
        return step

    for variant in args.variants:
        step = make_step(variant)
        for b in args.batches:
            x = jax.random.normal(jax.random.key(1), (b, size, size, 3))
            try:
                dt = in_scan_time(step, x, args.iters)
            except Exception as e:  # noqa: BLE001 — report and keep going
                print(json.dumps({"variant": variant, "batch": b,
                                  "error": repr(e)[:200]}), flush=True)
                continue
            print(json.dumps({
                "variant": variant, "batch": b,
                "ms_per_call": round(dt * 1e3, 2),
                "ms_per_sample": round(dt * 1e3 / b, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
