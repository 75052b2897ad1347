#!/usr/bin/env python
"""Unconditional sampling CLI.

The capability kept from upstream in the reference (SURVEY.md §3.5:
GaussianDiffusion.p_sample_loop / ddim_sample_loop and the Karras samplers
via utils_model.model_fn): generate unconditional samples from a checkpoint
with either the discrete ancestral/DDIM chains or any continuous Karras
sampler, batched and jitted.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    from ..utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from .. import ckpt, config as kconfig, ddpm_sampling, precond, samplers, schedules
    from .sample_condition import to_pil_image

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--config", required=True)
    p.add_argument("-n", type=int, default=4, help="number of samples")
    p.add_argument("--sampler", default="heun",
                   choices=["heun", "euler", "dpmpp_2m", "dpmpp_sde", "lms",
                            "dpm_2", "ancestral", "ddim"])
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--eta", type=float, default=0.0, help="ddim eta")
    p.add_argument("--respacing", default=None,
                   help="timestep respacing for the discrete chains, e.g. "
                        "'50' or 'ddim25' (ref: respace.py:7-60)")
    p.add_argument("--logdir", default="runs/sample_uncond")
    p.add_argument("--prefix", default="sample")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    args = p.parse_args(argv)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    config = kconfig.load_config(args.config)
    mc = config["model"]
    model, tables = kconfig.make_openai_model(mc, dtype=dtype)
    size = mc["input_size"][0]

    if os.path.isdir(args.checkpoint):
        params = ckpt.load_checkpoint(args.checkpoint)
    else:
        params = ckpt.convert_adm_state_dict(
            ckpt.load_torch_checkpoint(args.checkpoint))

    if dtype == jnp.bfloat16:
        # numerically identical hoist of flax's per-use bf16 casts; kills
        # the per-NFE f32 weight-pack stream (RESULTS_VJP_AUDIT.json)
        from ..utils import precast_inference_params
        params = precast_inference_params(params)

    def model_fn(x, t):
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (x.shape[0],))
        return model.apply({"params": params}, x, t)

    key = jax.random.key(args.seed)
    shape = (args.n, size, size, 3)

    if args.sampler in ("ancestral", "ddim"):
        # discrete-time chains (ref: gaussian_diffusion.py:441, 625)
        if args.respacing:
            from .. import diffusion as diff_mod
            openai_cfg = dict(kconfig.OPENAI_MODEL_DEFAULTS)
            openai_cfg.update(mc.get("openai", {}))
            tables_d = diff_mod.make_diffusion(openai_cfg["diffusion_steps"],
                                               openai_cfg["noise_schedule"],
                                               args.respacing)
        else:
            tables_d = tables

        def model_fn_d(x, t):
            # respaced index -> original timestep for the model
            # (ref: respace.py:116-128 _WrappedModel)
            t_orig = tables_d.timestep_map[jnp.asarray(t, jnp.int32)]
            return model_fn(x, t_orig)

        loop = (ddpm_sampling.p_sample_loop if args.sampler == "ancestral"
                else lambda *a, **k: ddpm_sampling.ddim_sample_loop(
                    *a, eta=args.eta, **k))
        out = jax.jit(lambda k: loop(tables_d, model_fn_d, shape, k))(key)
    else:
        def model_apply(p_, x, t):
            return model_fn(x, t)[..., :3]

        denoise_p = precond.make_discrete_eps_denoiser(model_apply,
                                                       tables.log_sigmas)
        sigmas = schedules.get_sigmas_karras(args.steps, mc["sigma_min"],
                                             mc["sigma_max"])
        fn = getattr(samplers, f"sample_{args.sampler}")

        @jax.jit
        def run(k):
            k1, k2 = jax.random.split(k)
            x = jax.random.normal(k1, shape) * mc["sigma_max"]
            return fn(lambda xx, s, kk: denoise_p(None, xx, s), x, sigmas, k2)

        out = run(key)

    os.makedirs(args.logdir, exist_ok=True)
    for i in range(args.n):
        to_pil_image(np.asarray(out[i])).save(
            os.path.join(args.logdir, f"{args.prefix}_{i}.png"))
    print(f"wrote {args.n} samples to {args.logdir}")
    return np.asarray(out)


if __name__ == "__main__":
    main()
