#!/usr/bin/env python
"""Per-stage 3x3-conv A/B on the chip: XLA NHWC vs NCHW vs im2col vs
Winograd (jnp + pallas), fwd and fwd+vjp, at the FFHQ-256 UNet's actual
stage shapes under the per-sample-map batch (B=1) and B=4.

Motivation (VERDICT r3 #4): the trace shows convs at 71.5% of device time
running at 64-79% of bf16 peak each — the remaining MFU gap is conv
efficiency itself. This measures which formulation XLA tiles best per
(spatial, channels) stage so the torso can route per-shape winners.

Usage (on TPU):  python scripts/bench_conv_stage_shapes.py [--repeats 50]
Emits one JSON line per (shape, variant, mode) plus a winners summary.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from kdip_tpu.ops import conv_mxu
from kdip_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from kdip_tpu.ops.experimental.winograd import winograd_conv3x3_jnp

# (H, C_in, C_out): the FFHQ-256 torso's distinct 3x3 stride-1 stages
# (model_channels=128, channel_mult=(1,1,2,2,4,4); decoder convs see the
# same shapes with doubled Cin via split-skip halves, covered by Cin=C).
STAGES = [(256, 128, 128), (128, 128, 128), (64, 256, 256),
          (32, 256, 256), (16, 512, 512), (8, 512, 512)]

VARIANTS = {
    "lax_nhwc": lambda x, k: conv_mxu.conv3x3_nhwc(x, k),
    "lax_nchw": lambda x, k: conv_mxu.conv3x3_nchw(x, k),
    "im2col": lambda x, k: conv_mxu.conv3x3_im2col(x, k),
    "wino_jnp": lambda x, k: winograd_conv3x3_jnp(x, k),
}


def wino_pallas(x, k):
    from kdip_tpu.ops.experimental.winograd_pallas import winograd_conv3x3_pallas
    return winograd_conv3x3_pallas(x, k)


def time_fn(fn, x, k, repeats, grad=False):
    """Scan-chained on-device timing: `repeats` iterations with a forced
    data dependence between them, one dispatch total. Per-dispatch wall
    timing (async dispatch + block on the last result) is UNRELIABLE on the
    axon transport — it reported 1165 TF/s for a single conv, 6x the bf16
    peak, i.e. it measures host dispatch cost, not device time. The scan
    chain is the same harness bench_winograd.py uses; its feedback add
    costs one x-sized read+write per iteration, identical across variants."""
    if grad:
        def step(xx, kk):
            return jax.grad(lambda q, w: jnp.sum(fn(q, w) ** 2),
                            argnums=0)(xx, kk)
    else:
        step = fn

    @jax.jit
    def run(xx, kk):
        def body(c, _):
            out = step(c, kk)
            fb = (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(c.dtype)
            return c + fb, None
        out, _ = jax.lax.scan(body, xx, None, length=repeats)
        return jnp.sum(out.astype(jnp.float32))

    _ = float(run(x, k))  # compile
    t0 = time.perf_counter()
    _ = float(run(x, k))
    return (time.perf_counter() - t0) / repeats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--repeats", type=int, default=50)
    p.add_argument("--batches", type=int, nargs="*", default=[1, 4])
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--out", default=None)
    p.add_argument("--variants", nargs="*", default=None,
                   help="subset of variant names (default: all)")
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)

    variants = dict(VARIANTS)
    try:
        wino_pallas(jnp.zeros((1, 8, 8, 8), dtype),
                    jnp.zeros((3, 3, 8, 8), dtype))
        variants["wino_pallas"] = wino_pallas
    except Exception as e:  # pallas unavailable on this backend
        print(f"# wino_pallas skipped: {type(e).__name__}", file=sys.stderr)
    if args.variants:
        variants = {n: f for n, f in variants.items() if n in args.variants}

    rows = []
    for B in args.batches:
        for (H, C, F) in STAGES:
            key = jax.random.key(H * 1000 + C)
            x = jax.random.normal(key, (B, H, H, C), dtype)
            k = (jax.random.normal(jax.random.key(7), (3, 3, C, F),
                                   jnp.float32) * 0.05).astype(dtype)
            flops = 2 * B * H * H * 9 * C * F
            base = {}
            for name, fn in variants.items():
                try:
                    t_f = time_fn(fn, x, k, repeats=args.repeats)
                    t_g = time_fn(fn, x, k, repeats=args.repeats,
                                  grad=True)
                except Exception as e:
                    print(f"# {name} B={B} H={H} C={C}: "
                          f"{type(e).__name__}: {e}", file=sys.stderr)
                    continue
                row = {"B": B, "H": H, "C": C, "F": F, "variant": name,
                       "fwd_us": round(t_f * 1e6, 1),
                       "fwd_tflops": round(flops / t_f / 1e12, 1),
                       "fwd_vjp_us": round(t_g * 1e6, 1)}
                base[name] = t_f
                rows.append(row)
                print(json.dumps(row), flush=True)
            if "lax_nhwc" in base:
                best = min(base, key=base.get)
                print(json.dumps({
                    "B": B, "H": H, "C": C, "winner": best,
                    "speedup_vs_nhwc": round(base["lax_nhwc"] / base[best],
                                             3)}), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
