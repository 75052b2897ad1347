#!/usr/bin/env python
"""End-to-end demo on TPU: train a diffusion model from scratch on synthetic
images, then solve all four inverse problems with guided posterior sampling
and compare covariance types — no pretrained checkpoints required.

Writes per-task metrics to `runs/toy_e2e/results.json` and (optionally)
reconstruction PNGs. This is the framework's "hello world": the same code
path the FFHQ/ImageNet experiments use, at toy scale.

Usage: python -m examples.toy_end_to_end [--size 32] [--train-steps 600]
"""

import argparse
import json
import os
import time


def synthetic_batch(key, n, size):
    import jax
    import jax.numpy as jnp
    k1, k2, k3 = jax.random.split(key, 3)
    xs = jnp.linspace(-1, 1, size)
    yy, xx = jnp.meshgrid(xs, xs, indexing="ij")
    theta = jax.random.uniform(k1, (n, 1, 1, 1)) * 2 * jnp.pi
    ramp = (jnp.cos(theta) * xx[None, :, :, None]
            + jnp.sin(theta) * yy[None, :, :, None])
    c0 = jax.random.uniform(k2, (n, 1, 1, 3)) * 2 - 1
    c1 = jax.random.uniform(k3, (n, 1, 1, 3)) * 2 - 1
    return jnp.clip(c0 + (c1 - c0) * (ramp + 1) / 2, -1, 1)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from kdip_tpu import (ddpm_sampling, diffusion, guidance, metrics,
                          samplers, schedules)
    from kdip_tpu import operators as kops
    from kdip_tpu.models import adm

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--size", type=int, default=32)
    p.add_argument("--train-steps", type=int, default=600)
    p.add_argument("--sample-steps", type=int, default=30)
    p.add_argument("--logdir", type=str, default="runs/toy_e2e")
    p.add_argument("--save-img", action="store_true")
    args = p.parse_args()
    SIZE = args.size

    model = adm.ADMUNet(image_size=SIZE, model_channels=64, num_res_blocks=1,
                        attention_resolutions=(4,), channel_mult=(1, 2, 2),
                        num_heads=4, num_head_channels=16, out_channels=6)
    params = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)),
                        jnp.zeros((1,)))["params"]
    tables = diffusion.make_diffusion(1000, "linear")

    def model_apply(p_, x, t):
        return model.apply({"params": p_}, x, t.astype(jnp.float32))

    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, key):
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(k_t, (batch.shape[0],), 0, 1000)

        def loss_fn(p_):
            terms = ddpm_sampling.training_losses(
                tables, lambda x, tt: model_apply(p_, x, tt), batch, t, k_n,
                loss_type="rescaled_mse")
            return jnp.mean(terms["loss"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    print(f"training {args.train_steps} steps at {SIZE}px ...", flush=True)
    key = jax.random.key(1)
    t0 = time.time()
    for i in range(args.train_steps):
        key, k_b, k_s = jax.random.split(key, 3)
        params, opt_state, loss = train_step(
            params, opt_state, synthetic_batch(k_b, 32, SIZE), k_s)
        if i % 100 == 0:
            print(f"  step {i}: loss {float(loss):.4f}", flush=True)
    print(f"trained in {time.time() - t0:.0f}s", flush=True)

    operators = {
        "inpainting": kops.get_operator(
            "inpainting", sigma_s=0.05,
            mask_opt=dict(mask_type="random", mask_prob_range=(0.5, 0.5),
                          image_size=SIZE), seed=0),
        "gaussian_deblur": kops.get_operator(
            "gaussian_blur", in_shape=(1, 3, SIZE, SIZE), kernel_size=9,
            intensity=1.5, sigma_s=0.05),
        "motion_deblur": kops.get_operator(
            "motion_blur", in_shape=(1, 3, SIZE, SIZE), kernel_size=9,
            intensity=0.5, sigma_s=0.05, seed=0),
        "super_resolution": kops.get_operator(
            "super_resolution", in_shape=(1, 3, SIZE, SIZE), scale_factor=4,
            sigma_s=0.05),
    }
    guidances = [("uncond", "convert", {}), ("I", "convert", {}),
                 ("II", "convert", {}), ("pgdm", "pgdm", {}),
                 ("dps", "dps", {"zeta": 1.0}),
                 ("diffpir", "diffpir", {"lambda_": 10.0})]

    x0 = synthetic_batch(jax.random.key(42), 1, SIZE)
    sigmas = schedules.get_sigmas_karras(args.sample_steps, 0.01, 80.0)
    results = {}
    for op_name, op in operators.items():
        meas = op.measure(x0, jax.random.key(43))
        results[op_name] = {}
        for gname, cov, extra in guidances:
            cfg = guidance.GuidanceConfig(guidance=gname, x0_cov_type=cov,
                                          cg_maxiter=50, **extra)
            uncond, var_fn = guidance.make_openai_uncond(model_apply, tables,
                                                         cfg)
            denoise = guidance.make_condition_denoiser(uncond, var_fn, op,
                                                       meas, cfg, params=params)
            x_init = jax.random.normal(jax.random.key(7),
                                       (1, SIZE, SIZE, 3)) * 80.0
            out = samplers.sample_heun(denoise, x_init, sigmas,
                                       jax.random.key(8))
            m = metrics.compute_metrics(out, x0)
            results[op_name][f"{gname}/{cov}"] = m
            print(f"{op_name:18s} {gname:8s} {cov:8s} "
                  f"psnr={m['psnr']:6.2f} ssim={m['ssim']:.3f}", flush=True)
            if args.save_img:
                from kdip_tpu.cli.sample_condition import to_pil_image
                os.makedirs(args.logdir, exist_ok=True)
                to_pil_image(out[0]).save(
                    os.path.join(args.logdir, f"{op_name}_{gname}_{cov}.png"))

    # Fewer-NFE configs (capability past the reference's heun/euler-only
    # guided CLI): Type-I/convert with dpm++(2m) at half the steps, and heun
    # at half the steps, vs the full-budget heun above.
    half = max(4, args.sample_steps // 2)
    sigmas_half = schedules.get_sigmas_karras(half, 0.01, 80.0)
    cfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="convert",
                                  cg_maxiter=50)
    uncond, var_fn = guidance.make_openai_uncond(model_apply, tables, cfg)
    for op_name, op in operators.items():
        meas = op.measure(x0, jax.random.key(43))
        denoise = guidance.make_condition_denoiser(uncond, var_fn, op, meas,
                                                   cfg, params=params)
        x_init = jax.random.normal(jax.random.key(7),
                                   (1, SIZE, SIZE, 3)) * 80.0
        for sname, fn in (("dpmpp_2m", samplers.sample_dpmpp_2m),
                          ("heun", samplers.sample_heun)):
            out = fn(denoise, x_init, sigmas_half, jax.random.key(8))
            m = metrics.compute_metrics(out, x0)
            results[op_name][f"I/convert/{sname}@{half}"] = m
            print(f"{op_name:18s} I/convert {sname}@{half:2d}steps "
                  f"psnr={m['psnr']:6.2f} ssim={m['ssim']:.3f}", flush=True)

    os.makedirs(args.logdir, exist_ok=True)
    with open(os.path.join(args.logdir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.logdir}/results.json")


if __name__ == "__main__":
    main()
