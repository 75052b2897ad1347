#!/usr/bin/env python
"""Per-phase roofline of the flagship guided-sampling workload on the chip
(VERDICT r2 next #3: "publish MFU and reconcile the roofline story").

For each phase — model fwd, fwd+vjp (one guided NFE's model work), and the
full guided denoise incl. the covariance solve — measures wall-clock on the
TPU and reads FLOPs / bytes-accessed from XLA's compiled cost analysis,
then reports sustained TFLOP/s (vs bf16 peak) and GB/s (vs HBM peak) so a
reader can see which roofline binds each phase.

Run on the chip: python scripts/roofline_256.py [--out RESULTS_ROOFLINE.json]
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

PEAK_TFLOPS = float(os.environ.get("KDIP_PEAK_TFLOPS", "197"))  # v5e bf16
PEAK_GBS = float(os.environ.get("KDIP_PEAK_GBS", "819"))        # v5e HBM


def measure(name, fn, args, n_runs=20):
    """fn(*args) -> (result, x_next) where x_next has args[-1]'s shape.
    Cost analysis on the single-call program; wall-clock from an on-device
    lax.scan that CHAINS x through the iterations (host-side per-dispatch
    timing through the tunnel'd PJRT stream is unreliable — the same
    pattern scripts/profile_vjp_batch.py uses)."""
    jitted = jax.jit(fn)
    c = jitted.lower(*args).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]

    static, x0 = args[:-1], args[-1]

    @jax.jit
    def run(x):
        def body(carry, _):
            _, nxt = fn(*static, carry)
            return nxt, None
        out, _ = jax.lax.scan(body, x, None, length=n_runs)
        return jnp.sum(out.astype(jnp.float32))

    _ = float(run(x0))  # compile + warmup
    t0 = time.time()
    _ = float(run(x0))
    ms = (time.time() - t0) / n_runs * 1e3
    gflop = float(c.get("flops", 0.0)) / 1e9
    gb = float(c.get("bytes accessed", 0.0)) / 1e9
    tflops = gflop / ms if ms else 0.0        # GFLOP/ms == TFLOP/s
    gbs = gb / ms * 1e3 if ms else 0.0
    rec = {"ms": round(ms, 2), "gflop": round(gflop, 1), "gb": round(gb, 2),
           "tflops_sustained": round(tflops, 1),
           "pct_peak_flops": round(100 * tflops / PEAK_TFLOPS, 1),
           "gb_per_s": round(gbs, 0),
           "pct_peak_bw": round(100 * gbs / PEAK_GBS, 1),
           "arith_intensity_flop_per_byte": round(gflop / gb, 1) if gb else None}
    print(f"{name}: {rec}", flush=True)
    return rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(REPO, "RESULTS_ROOFLINE.json"))
    args = p.parse_args()

    import kdip_tpu as K
    from kdip_tpu.models import adm

    model = adm.ffhq_unet(dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)),
                        jnp.zeros((1,)))["params"]
    tables = K.diffusion.make_diffusion(1000, "linear")

    def model_apply(p_, x, t):
        return model.apply({"params": p_}, x, t.astype(jnp.float32))

    x = jax.random.normal(jax.random.key(1), (1, 256, 256, 3))
    sigma = jnp.float32(1.0)

    results = {"peak_tflops_bf16": PEAK_TFLOPS, "peak_hbm_gbs": PEAK_GBS,
               "phases": {}}

    def fwd(p_, s, xx):
        y = model_apply(p_, xx, jnp.broadcast_to(s, (1,)))
        return y, xx + 1e-6 * y[..., :3]

    results["phases"]["fwd"] = measure("fwd", fwd, (params, sigma, x))

    def fwd_vjp(p_, s, xx):
        def f(v):
            return model_apply(p_, v, jnp.broadcast_to(s, (1,)))
        y, vjp = jax.vjp(f, xx)
        (ct,) = vjp(jnp.ones_like(y))
        return y, xx + 1e-6 * ct

    results["phases"]["fwd_vjp"] = measure("fwd+vjp", fwd_vjp,
                                           (params, sigma, x))

    # full guided denoise (Type-I convert, inpainting) at a sub-threshold
    # sigma (CG branch) and a supra-threshold sigma (isotropic/closed form)
    op = K.operators.get_operator(
        "inpainting", sigma_s=0.05,
        mask_opt=dict(mask_type="random", mask_prob_range=(0.5, 0.5),
                      image_size=256), seed=0)
    x0 = jax.random.uniform(jax.random.key(2), (1, 256, 256, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(3))
    gcfg = K.guidance.GuidanceConfig(guidance="I", x0_cov_type="convert",
                                     cg_maxiter=100)
    uncond, var_fn = K.guidance.make_openai_uncond(model_apply, tables, gcfg)
    denoise = K.guidance.make_condition_denoiser(uncond, var_fn, op, meas,
                                                 gcfg, params=params)

    def guided(ss, xx):
        out = denoise(xx, ss, jax.random.key(0))
        return out, out  # hat_x0 is x-shaped and in [-1,1]; chain directly

    for name, s in (("guided_nfe_cg_branch", 0.05),
                    ("guided_nfe_high_sigma", 10.0)):
        results["phases"][name] = measure(name, guided,
                                          (jnp.float32(s), x))

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
