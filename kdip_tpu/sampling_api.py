"""High-level posterior sampling API.

One-call equivalent of the reference CLI flow (sample_condition_openai.py:
156-196): build the guided denoiser for a measurement, run a Karras sampler
over the sigma schedule, return the reconstruction. The entire trajectory —
UNet forwards, guidance VJPs, CG solves, churn noise — compiles into a single
jitted XLA program per (operator, guidance, steps) configuration, reusable
across images (the measurement is a traced argument, not a constant).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from . import diffusion as diff
from . import guidance as gd
from . import samplers, schedules
from .operators import Measurement


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Sampler settings (defaults = the reference CLI defaults,
    sample_condition_openai.py:89-92, 186-194)."""
    steps: int = 50
    sigma_min: float = 1e-2
    sigma_max: float = 80.0
    rho: float = 7.0
    sampler: str = "heun"   # or "euler"
    ode: bool = False       # True disables churn
    s_churn: float = 80.0
    s_tmin: float = 0.05
    s_tmax: float = 50.0
    s_noise: float = 1.003
    # Per-sample lax.map over the batch inside each guided NFE. On v5e the
    # batched 256px UNet vjp picks worse conv layouts than batch-1 (B=4
    # costs 26.0 ms/sample batched vs 12.2 ms/sample mapped — see
    # scripts/profile_vjp_batch.py results in RESULTS.md), so mapping is the
    # faster layout for multi-sample runs. Only applies when the measurement
    # batch is 1 (samples share one measurement).
    per_sample_map: bool = True


def build_posterior_sampler(model_apply: Callable, tables: diff.DiffusionTables,
                            operator, guidance_cfg: gd.GuidanceConfig,
                            sampler_cfg: SamplerConfig = SamplerConfig(),
                            recon_mse: Optional[Dict[str, jnp.ndarray]] = None,
                            v2: bool = False, image_size: int = 256,
                            channels: int = 3, uncond_pair=None):
    """Returns a jittable `sample(params, measurement, key) -> hat_x0`.

    model_apply(params, x_scaled, t) -> raw UNet output (v1) or the
    (eps, logvar, logvar_ot) triple (v2). `uncond_pair` overrides the
    (uncond_pred, x0_var_fn) builders for non-OpenAI model families
    (e.g. gd.make_kdiff_v2_uncond for the native DCT-Var model).
    """
    sigmas = schedules.get_sigmas_karras(sampler_cfg.steps, sampler_cfg.sigma_min,
                                         sampler_cfg.sigma_max, sampler_cfg.rho)

    if uncond_pair is not None:
        uncond, var_fn = uncond_pair
    elif v2:
        uncond, var_fn = gd.make_openai_v2_uncond(model_apply, tables, guidance_cfg)
    else:
        uncond, var_fn = gd.make_openai_uncond(model_apply, tables, guidance_cfg,
                                               recon_mse=recon_mse)

    sample_fns = {"heun": samplers.sample_heun, "euler": samplers.sample_euler,
                  "dpmpp_2m": samplers.sample_dpmpp_2m}
    sampler_fn = sample_fns[sampler_cfg.sampler]

    warm = guidance_cfg.cg_warm_start
    if warm:
        assert sampler_cfg.sampler in ("heun", "euler"), (
            "cg_warm_start is wired through the heun/euler solver-state "
            f"carry, not {sampler_cfg.sampler!r}")

    def sample(params, measurement: Measurement, key, n: int = 1,
               return_info: bool = False):
        """return_info=True additionally returns an info dict with
        `cg_max_residual`, the worst CG relative residual |r|/|b| over
        every likelihood solve in the trajectory — the on-device
        convergence signal replacing the reference's scipy warning
        (condition.py:344-345), which host-callback-less TPU plugins
        cannot print — and, with cg_warm_start, `cg_total_iters`, the CG
        iteration total the warm carry is saving against."""
        denoise = gd.make_condition_denoiser(uncond, var_fn, operator,
                                             measurement, guidance_cfg,
                                             params=params, v2=v2,
                                             with_info=return_info or warm)
        mapped = (sampler_cfg.per_sample_map and n > 1
                  and measurement.y.shape[0] == 1)
        solver_state = None
        if warm:
            per_call = gd.init_solver_state(
                operator, ((1 if mapped else n), image_size, image_size,
                           channels))
            if mapped:
                # lax.map slices the leading axis: store one per-call state
                # (batch dim 1) per sample
                solver_state = jax.tree.map(
                    lambda l: jnp.zeros((n,) + jnp.shape(l),
                                        jnp.asarray(l).dtype), per_call)
            else:
                solver_state = jax.tree.map(jnp.asarray, per_call)
        if mapped:
            inner = denoise

            if warm:
                def denoise(x, sigma, key=None, solver_state=None):  # noqa: F811
                    def f(args):
                        xi, sti = args
                        out_i, info_i = inner(xi[None], sigma, key,
                                              solver_state=sti)
                        return (out_i[0], info_i["cg_resid"],
                                info_i["solver_state"])
                    out, resid, st = jax.lax.map(f, (x, solver_state))
                    return out, {"cg_resid": jnp.max(resid),
                                 "solver_state": st}
            elif return_info:
                def denoise(x, sigma, key=None):  # noqa: F811
                    out, info = jax.lax.map(
                        lambda xi: inner(xi[None], sigma, key), x)
                    return out[:, 0], {"cg_resid": jnp.max(info["cg_resid"])}
            else:
                def denoise(x, sigma, key=None):  # noqa: F811
                    return jax.lax.map(
                        lambda xi: inner(xi[None], sigma, key)[0], x)
        k_init, k_samp = jax.random.split(key)
        x = jax.random.normal(k_init, (n, image_size, image_size, channels)
                              ) * sampler_cfg.sigma_max
        kwargs = {}
        if sampler_cfg.sampler in ("heun", "euler") and not sampler_cfg.ode:
            kwargs = dict(s_churn=sampler_cfg.s_churn, s_tmin=sampler_cfg.s_tmin,
                          s_tmax=sampler_cfg.s_tmax, s_noise=sampler_cfg.s_noise)
        if warm:
            kwargs["solver_state"] = solver_state
        out = sampler_fn(denoise, x, sigmas, k_samp,
                         return_info=return_info or warm, **kwargs)
        if warm and not return_info:
            return out[0]
        return out

    return sample


def posterior_sample(model_apply, tables, operator, measurement, params, key,
                     guidance_cfg: Optional[gd.GuidanceConfig] = None,
                     sampler_cfg: Optional[SamplerConfig] = None, **kw):
    """Convenience one-shot wrapper."""
    guidance_cfg = guidance_cfg or gd.GuidanceConfig()
    sampler_cfg = sampler_cfg or SamplerConfig()
    sampler = build_posterior_sampler(model_apply, tables, operator,
                                      guidance_cfg, sampler_cfg, **kw)
    return sampler(params, measurement, key)
