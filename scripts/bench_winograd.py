#!/usr/bin/env python
"""On-chip benchmark: direct conv vs Winograd F(2,3) (jnp and Pallas).

Three levels, all on the real TPU:
  1. single conv at the guided-NFE hot shapes (RESULTS_PROFILE.json's top
     ops: the 256px decoder in_conv halves)
  2. full FFHQ-256 ADM UNet fwd and fwd+vjp, winograd on/off
  3. numerics: model-output drift winograd-vs-direct at the bench config

Run: python scripts/bench_winograd.py [--level 1 2 3]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from kdip_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def in_scan_time(fn, args, iters=16):
    @jax.jit
    def run(a):
        def body(c, _):
            out = fn(c, *a[1:])
            # chain iterations without assuming out channels >= in channels
            fb = jnp.sum(out.astype(jnp.float32)) * 1e-12
            return c + fb.astype(c.dtype), None
        out, _ = jax.lax.scan(body, a[0], None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    _ = float(run(args))
    t0 = time.time()
    _ = float(run(args))
    return (time.time() - t0) / iters * 1e3  # ms


def level1(iters, only_shape=None):
    from kdip_tpu.ops.experimental import winograd as wg
    from kdip_tpu.ops.experimental import winograd_pallas as wp

    def direct(x, w):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(x, w.astype(x.dtype), (1, 1),
                                            [(1, 1), (1, 1)],
                                            dimension_numbers=dn)

    shapes = [(256, 128, 128), (256, 256, 128), (128, 256, 256),
              (64, 256, 256), (32, 512, 512)]
    for hw, c, f in shapes:
        if only_shape is not None and list(only_shape) != [hw, c, f]:
            continue
        x = jax.random.normal(jax.random.key(0), (1, hw, hw, c),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.key(1), (3, 3, c, f),
                              jnp.float32) * 0.05
        gflop = 2 * 9 * hw * hw * c * f / 1e9
        for name, fn in [
            ("direct", direct),
            ("wino_jnp", lambda xx, ww: wg.winograd_conv3x3_jnp(xx, ww)),
            ("wino_pal", lambda xx, ww: wp.winograd_conv3x3_pallas(xx, ww)),
        ]:
            try:
                t = in_scan_time(fn, (x, w), iters)

                def vjp_fn(xx, ww, cv=fn):
                    y, pull = jax.vjp(lambda q: cv(q, ww), xx)
                    return pull(jnp.ones_like(y))[0]

                tv = in_scan_time(vjp_fn, (x, w), iters)
                print(f"[{hw}px C{c}->F{f}] {name:9s} "
                      f"fwd {t:7.3f} ms ({gflop/t:5.0f} TF/s naive-eff)  "
                      f"vjp {tv:7.3f} ms", flush=True)
            except Exception as e:
                print(f"[{hw}px C{c}->F{f}] {name:9s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


def level2(iters):
    from kdip_tpu.models import adm

    x = jax.random.normal(jax.random.key(0), (1, 256, 256, 3), jnp.float32)
    t = jnp.full((1,), 500.0)
    for wino in (False, True):
        model = adm.ffhq_unet(dtype=jnp.bfloat16, winograd=wino)
        params = model.init(jax.random.key(1), x, t)["params"]

        def fwd(xx, p):
            return model.apply({"params": p}, xx, t)

        tf = in_scan_time(fwd, (x, params), iters)

        def vjp_fn(xx, p):
            y, pull = jax.vjp(lambda q: model.apply({"params": p}, q, t), xx)
            return pull(jnp.ones_like(y))[0]

        tv = in_scan_time(vjp_fn, (x, params), iters)
        print(f"FFHQ-256 UNet winograd={wino}: fwd {tf:.3f} ms, "
              f"fwd+vjp {tv:.3f} ms", flush=True)


def level3():
    from kdip_tpu.models import adm

    x = jax.random.uniform(jax.random.key(2), (1, 256, 256, 3)) * 2 - 1
    t = jnp.full((1,), 500.0)
    m_dir = adm.ffhq_unet(dtype=jnp.bfloat16, winograd=False)
    m_win = adm.ffhq_unet(dtype=jnp.bfloat16, winograd=True)
    m_f32 = adm.ffhq_unet(dtype=jnp.float32)
    params = m_dir.init(jax.random.key(3), x, t)["params"]
    # de-vacuate: zero-init out_convs annihilate the compared contributions
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.key(4), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [0.05 * jax.random.normal(k, l.shape, l.dtype)
                  for k, l in zip(keys, leaves)])
    y_ref = jax.jit(lambda p, q: m_f32.apply({"params": p}, q, t))(params, x)
    y_dir = jax.jit(lambda p, q: m_dir.apply({"params": p}, q, t))(params, x)
    y_win = jax.jit(lambda p, q: m_win.apply({"params": p}, q, t))(params, x)
    scale = float(jnp.max(jnp.abs(y_ref)))
    e_dir = float(jnp.max(jnp.abs(y_dir.astype(jnp.float32) - y_ref)))
    e_win = float(jnp.max(jnp.abs(y_win.astype(jnp.float32) - y_ref)))
    print(f"FFHQ-256 output drift vs f32: direct-bf16 {e_dir/scale:.3e}, "
          f"winograd-bf16 {e_win/scale:.3e} (scale {scale:.3f})",
          flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, nargs="+", default=[1, 2, 3])
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--shape", type=int, nargs=3, default=None,
                   help="restrict level 1 to one (hw, cin, cout) shape")
    args = p.parse_args()
    if 1 in args.level:
        level1(args.iters, args.shape)
    if 2 in args.level:
        level2(args.iters)
    if 3 in args.level:
        level3()


if __name__ == "__main__":
    main()
