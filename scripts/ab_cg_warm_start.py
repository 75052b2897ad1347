#!/usr/bin/env python
"""A/B: CG warm-start carry (GuidanceConfig.cg_warm_start) vs cold solves.

Drives the guided denoiser over a Karras trajectory twice — once seeding
each CG solve from the previous step's iterate (the warm carry the sampler
threads), once from zero (the reference's scipy x0=None semantics,
condition.py:343) — and reports total CG iterations plus the trajectory
divergence. Both runs converge every solve to the same tol * |b| threshold,
so the outputs must agree to ~cg_tol; only the iteration count (the CG
wall-time) differs.

CPU-sized by default (64px tiny UNet, tmpd covariance — the CG-heaviest
workload, bench.py's gaussian_deblur_tmpd row). On-chip the end-to-end
effect is measured by `KDIP_BENCH_WARM=1 python bench.py`.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--cov", default="tmpd")
    ap.add_argument("--operator", default="gaussian_blur")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    from kdip_tpu import diffusion, guidance, schedules
    from kdip_tpu import operators as kops
    from kdip_tpu.models import adm

    size = args.size
    model = adm.ADMUNet(image_size=size, model_channels=32, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_heads=2, num_head_channels=16, out_channels=6)
    params = model.init(jax.random.key(0), jnp.zeros((1, size, size, 3)),
                        jnp.zeros((1,)))["params"]
    tables = diffusion.make_diffusion(1000, "linear")

    def model_apply(p, x, t):
        return model.apply({"params": p}, x,
                           jnp.broadcast_to(t, (x.shape[0],)).astype(jnp.float32))

    if args.operator == "gaussian_blur":
        op = kops.get_operator("gaussian_blur", in_shape=(1, 3, size, size),
                               kernel_size=31, intensity=3.0, sigma_s=0.05,
                               seed=0)
    else:
        op = kops.get_operator("inpainting", sigma_s=0.05,
                               mask_opt=dict(mask_type="random",
                                             mask_prob_range=(0.5, 0.5),
                                             image_size=size), seed=0)

    cfg = guidance.GuidanceConfig(guidance="I", x0_cov_type=args.cov,
                                  cg_warm_start=True)
    x0 = jax.random.uniform(jax.random.key(1), (1, size, size, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(2))
    uncond, var_fn = guidance.make_openai_uncond(model_apply, tables, cfg)
    denoise = guidance.make_condition_denoiser(uncond, var_fn, op, meas, cfg,
                                               params=params, with_info=True)
    jitted = jax.jit(lambda x, s, st: denoise(x, s, None, solver_state=st))

    sigmas = schedules.get_sigmas_karras(args.steps, 1e-2, 80.0, 7.0)
    key = jax.random.key(3)
    x_init = jax.random.normal(key, (1, size, size, 3)) * 80.0
    st_zero = jax.tree.map(jnp.asarray,
                           guidance.init_solver_state(op, (1, size, size, 3)))

    def run(warm: bool):
        x, st = x_init, st_zero
        total, per_step = 0, []
        for i in range(args.steps):
            sigma = sigmas[i]
            out, info = jitted(x, sigma, st if warm else st_zero)
            st = info["solver_state"]
            k = int(st["iters"])
            total += k
            per_step.append(k)
            d = (x - out) / sigma
            x = x + d * (sigmas[i + 1] - sigma)
        return x, total, per_step

    x_cold, it_cold, steps_cold = run(warm=False)
    x_warm, it_warm, steps_warm = run(warm=True)
    diff = float(jnp.abs(x_cold - x_warm).max())
    rel = diff / float(jnp.abs(x_cold).max())
    print(f"cold CG iters: {it_cold}  per-step {steps_cold}")
    print(f"warm CG iters: {it_warm}  per-step {steps_warm}")
    print(f"saving: {1 - it_warm / max(it_cold, 1):.1%}")
    print(f"trajectory max |diff|: {diff:.3e} (rel {rel:.3e})")
    assert rel < 5e-2, "warm-start diverged beyond solver tolerance effects"


if __name__ == "__main__":
    main()
