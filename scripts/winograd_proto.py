#!/usr/bin/env python
"""Prototype: Winograd F(4x4, 3x3) convolution for the UNet's hot 3x3 convs.

The post-split-skip trace (RESULTS_PROFILE.json) shows 71.5% of guided-NFE
device time in convs that individually run at only ~65-79% of bf16 peak.
All of them are 3x3 stride-1 same-padding NHWC convs. Winograd F(4,3)
computes each 4x4 output tile with 36 multiplies instead of 144 — a 4x
MXU-FLOP reduction — at the cost of materializing 6x6-transformed tiles
(36/16 = 2.25x activation inflation) unless the transforms are fused.

This script measures, on the real chip:
  1. correctness of the jnp Winograd vs lax.conv (f32 exact-ish, bf16 drift)
  2. fwd and vjp wall time vs lax.conv at the two hottest shapes
     (256px/128ch decoder stage, 64px/256ch stage)

Standard F(4,3) transform matrices (Lavin & Gray, "Fast Algorithms for
Convolutional Neural Networks", interpolation points {0, ±1, ±2}).
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# B^T (6x6): input transform, U = B^T d B
BT = np.array([
    [4,  0, -5,  0, 1, 0],
    [0, -4, -4,  1, 1, 0],
    [0,  4, -4, -1, 1, 0],
    [0, -2, -1,  2, 1, 0],
    [0,  2, -1, -2, 1, 0],
    [0,  4,  0, -5, 0, 1],
], dtype=np.float32)

# G (6x3): kernel transform, V = G g G^T
G = np.array([
    [1 / 4,      0,      0],
    [-1 / 6, -1 / 6, -1 / 6],
    [-1 / 6,  1 / 6, -1 / 6],
    [1 / 24, 1 / 12,  1 / 6],
    [1 / 24, -1 / 12, 1 / 6],
    [0,           0,      1],
], dtype=np.float32)

# A^T (4x6): output transform, Y = A^T M A
AT = np.array([
    [1, 1,  1, 1,  1, 0],
    [0, 1, -1, 2, -2, 0],
    [0, 1,  1, 4,  4, 0],
    [0, 1, -1, 8, -8, 1],
], dtype=np.float32)

# F(2x2, 3x3): milder coefficients (all +-1, 1/2) -> far better bf16 error,
# 16 muls per 2x2 output tile vs 36 naive = 2.25x FLOP reduction.
BT2 = np.array([
    [1,  0, -1,  0],
    [0,  1,  1,  0],
    [0, -1,  1,  0],
    [0,  1,  0, -1],
], dtype=np.float32)
G2 = np.array([
    [1,    0,   0],
    [0.5,  0.5, 0.5],
    [0.5, -0.5, 0.5],
    [0,    0,   1],
], dtype=np.float32)
AT2 = np.array([
    [1, 1,  1,  0],
    [0, 1, -1, -1],
], dtype=np.float32)


def _winograd_conv(x, w, BT_, G_, AT_, dtype=None):
    """3x3 stride-1 same-padding conv via Winograd F(m x m, 3x3).

    x: [B, H, W, C] with H % m == 0 == W % m; w: [3, 3, C, F] HWIO.
    Matmuls run in `dtype` (default x.dtype); tile transforms in f32.
    """
    dtype = dtype or x.dtype
    t = BT_.shape[0]          # transformed tile size (m + 2)
    m_out = AT_.shape[0]      # output tile size m
    Bsz, H, W, C = x.shape
    F = w.shape[-1]
    th, tw = H // m_out, W // m_out
    # same padding: 1 before; after = m*(th-1) + t - 1 - (H - 1) - 1 = t-m-1
    xp = jnp.pad(x, ((0, 0), (1, t - m_out - 1), (1, t - m_out - 1), (0, 0)))

    # gather the t*t stride-m shifted views: D [t, t, B, th, tw, C]
    rows = []
    for i in range(t):
        cols = []
        for j in range(t):
            cols.append(xp[:, i:i + m_out * th:m_out,
                           j:j + m_out * tw:m_out, :])
        rows.append(jnp.stack(cols, 0))
    d = jnp.stack(rows, 0)

    # input transform (f32 on VPU), then cast for the MXU matmuls
    u = jnp.einsum("ik,jl,klbtwc->ijbtwc", BT_, BT_, d.astype(jnp.float32))
    u = u.reshape(t * t, Bsz * th * tw, C).astype(dtype)

    v = jnp.einsum("ik,klcf,jl->ijcf", G_, w.astype(jnp.float32), G_)
    v = v.reshape(t * t, C, F).astype(dtype)

    # t*t batched matmuls — the MXU workload
    m = jnp.einsum("pnc,pcf->pnf", u, v)

    # output transform back to m x m tiles (f32)
    m = m.reshape(t, t, Bsz, th, tw, F).astype(jnp.float32)
    y = jnp.einsum("ki,lj,ijbtwf->btkwlf", AT_, AT_, m)
    return y.reshape(Bsz, H, W, F).astype(x.dtype)


def winograd_conv(x, w, dtype=None):
    return _winograd_conv(x, w, BT, G, AT, dtype)


def winograd_conv_f23(x, w, dtype=None):
    return _winograd_conv(x, w, BT2, G2, AT2, dtype)


def direct_conv(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, w.astype(x.dtype), (1, 1),
                                        [(1, 1), (1, 1)],
                                        dimension_numbers=dn)


def in_scan_time(fn, args, iters=16):
    @jax.jit
    def run(a):
        def body(c, _):
            out = fn(c, *a[1:])
            # keep shapes compatible for the scan carry: project back
            return c + 1e-12 * out[..., :c.shape[-1]].astype(c.dtype), None
        out, _ = jax.lax.scan(body, a[0], None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    _ = float(run(args))
    t0 = time.time()
    _ = float(run(args))
    return (time.time() - t0) / iters * 1e3  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shapes", type=str, nargs="+",
                   default=["256,128,128", "64,256,256"])
    p.add_argument("--iters", type=int, default=16)
    args = p.parse_args()

    # correctness at f32 (CPU-friendly too)
    key = jax.random.key(0)
    x = jax.random.normal(key, (1, 32, 32, 16), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (3, 3, 16, 8), jnp.float32) * 0.1
    ref = direct_conv(x, w)
    out = winograd_conv(x, w)
    err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    print(f"f32 correctness: rel max err {err:.3e}")

    out23 = winograd_conv_f23(x, w)
    err23 = float(jnp.max(jnp.abs(out23 - ref)) / jnp.max(jnp.abs(ref)))
    print(f"f32 F(2,3) correctness: rel max err {err23:.3e}")

    xb = x.astype(jnp.bfloat16)
    dir_bf = direct_conv(xb, w).astype(jnp.float32)
    err_dir = float(jnp.max(jnp.abs(dir_bf - ref)) / jnp.max(jnp.abs(ref)))
    for name, fn in [("F(4,3)", winograd_conv), ("F(2,3)", winograd_conv_f23)]:
        out_bf = fn(xb, w).astype(jnp.float32)
        e = float(jnp.max(jnp.abs(out_bf - ref)) / jnp.max(jnp.abs(ref)))
        print(f"bf16 drift vs f32 ref: {name} {e:.3e} (direct {err_dir:.3e})")

    for spec in args.shapes:
        hw, c, f = (int(s) for s in spec.split(","))
        x = jax.random.normal(key, (1, hw, hw, c), jnp.bfloat16)
        w = (jax.random.normal(jax.random.key(1), (3, 3, c, f), jnp.float32)
             * 0.05)

        gflop = 2 * 9 * hw * hw * c * f / 1e9
        for name, conv in [("direct", direct_conv),
                           ("winoF43", winograd_conv),
                           ("winoF23", winograd_conv_f23)]:
            t_fwd = in_scan_time(lambda xx, ww, cv=conv: cv(xx, ww), (x, w),
                                 args.iters)

            def vjp_fn(xx, ww, cv=conv):
                y, pull = jax.vjp(lambda q: cv(q, ww), xx)
                return pull(jnp.ones_like(y))[0]

            t_vjp = in_scan_time(vjp_fn, (x, w), args.iters)
            print(f"[{hw}px C{c}->F{f}] {gflop:.1f} GF  {name:8s} "
                  f"fwd {t_fwd:.3f} ms ({gflop/t_fwd:.0f} TF/s eff)  "
                  f"vjp {t_vjp:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
