"""Denoiser preconditioning and model adapters.

TPU-native equivalent of the reference's `k_diffusion/external.py` and
`k_diffusion/layers.py:13-84`: maps raw network outputs (eps / v / x0+logvar)
into the continuous-sigma Karras denoiser API `D(x, sigma) -> x0`.

Instead of nn.Module wrappers, adapters here are pure functions of
(params, x, sigma) built from a `model_apply` callable — they compose freely
with jax.jit / jax.vjp / shard_map.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from .schedules import append_dims


# ---------------------------------------------------------------------------
# EDM scalings
# ---------------------------------------------------------------------------

def edm_scalings(sigma, sigma_data: float = 1.0):
    """c_skip, c_out, c_in of Karras et al. (ref: k_diffusion/layers.py:21-25)."""
    c_skip = sigma_data ** 2 / (sigma ** 2 + sigma_data ** 2)
    c_out = sigma * sigma_data / (sigma ** 2 + sigma_data ** 2) ** 0.5
    c_in = 1 / (sigma ** 2 + sigma_data ** 2) ** 0.5
    return c_skip, c_out, c_in


def v_scalings(sigma, sigma_data: float = 1.0):
    """Scalings for v-prediction models (ref: k_diffusion/external.py:18-22)."""
    c_skip = sigma_data ** 2 / (sigma ** 2 + sigma_data ** 2)
    c_out = -sigma * sigma_data / (sigma ** 2 + sigma_data ** 2) ** 0.5
    c_in = 1 / (sigma ** 2 + sigma_data ** 2) ** 0.5
    return c_skip, c_out, c_in


def eps_scalings(sigma, sigma_data: float = 1.0):
    """Scalings for discrete eps models (ref: k_diffusion/external.py:97-100)."""
    c_out = -sigma
    c_in = 1 / (sigma ** 2 + sigma_data ** 2) ** 0.5
    return c_out, c_in


# ---------------------------------------------------------------------------
# sigma <-> t for discrete schedules
# ---------------------------------------------------------------------------

def sigma_to_t(log_sigmas: jnp.ndarray, sigma, quantize: bool = False):
    """Continuous interpolated timestep for a sigma
    (ref: k_diffusion/external.py:67-79).

    log_sigmas: [T] ascending log-sigma table. Returns float t (or int if
    quantize) with the same shape as `sigma`.
    """
    sigma = jnp.asarray(sigma)
    log_sigma = jnp.log(sigma)
    dists = log_sigma[..., None] - log_sigmas  # broadcast over trailing T dim
    if quantize:
        return jnp.argmin(jnp.abs(dists), axis=-1).astype(jnp.int32)
    T = log_sigmas.shape[0]
    low_idx = jnp.clip(jnp.argmax(jnp.cumsum((dists >= 0).astype(jnp.int32), axis=-1), axis=-1),
                       0, T - 2)
    high_idx = low_idx + 1
    low, high = log_sigmas[low_idx], log_sigmas[high_idx]
    w = jnp.clip((low - log_sigma) / (low - high), 0, 1)
    return (1 - w) * low_idx + w * high_idx


def t_to_sigma(log_sigmas: jnp.ndarray, t):
    """Inverse of sigma_to_t (ref: k_diffusion/external.py:81-85)."""
    t = jnp.asarray(t, dtype=jnp.float32)
    low_idx = jnp.floor(t).astype(jnp.int32)
    high_idx = jnp.ceil(t).astype(jnp.int32)
    w = t - jnp.floor(t)
    log_sigma = (1 - w) * log_sigmas[low_idx] + w * log_sigmas[high_idx]
    return jnp.exp(log_sigma)


# ---------------------------------------------------------------------------
# Denoiser adapters (pure-function factories)
# ---------------------------------------------------------------------------

def make_edm_denoiser(model_apply: Callable, sigma_data: float = 1.0) -> Callable:
    """EDM-preconditioned denoiser (ref: k_diffusion/layers.py:13-36).

    model_apply(params, x_scaled, sigma, **kw) -> model output.
    Returns denoise(params, x, sigma, **kw) -> x0.
    """
    def denoise(params, x, sigma, **kwargs):
        c_skip, c_out, c_in = [append_dims(c, x.ndim) for c in edm_scalings(sigma, sigma_data)]
        return model_apply(params, x * c_in, sigma, **kwargs) * c_out + x * c_skip
    return denoise


def make_v_denoiser(model_apply: Callable, sigma_data: float = 1.0) -> Callable:
    """v-diffusion denoiser (ref: k_diffusion/external.py:10-39)."""
    def denoise(params, x, sigma, **kwargs):
        c_skip, c_out, c_in = [append_dims(c, x.ndim) for c in v_scalings(sigma, sigma_data)]
        t = jnp.arctan(sigma) / jnp.pi * 2
        return model_apply(params, x * c_in, t, **kwargs) * c_out + x * c_skip
    return denoise


def make_discrete_eps_denoiser(model_apply: Callable, log_sigmas: jnp.ndarray,
                               quantize: bool = False) -> Callable:
    """Discrete-schedule eps-model denoiser (ref: k_diffusion/external.py:88-114).

    model_apply(params, x_scaled, t, **kw) -> eps (already sliced to C channels).
    This is also the CompVis (latent-diffusion) adapter shape — the reference's
    CompVisDenoiser (external.py:172-179) only differs in routing through
    `apply_model`, which callers fold into model_apply.
    """
    def denoise(params, x, sigma, **kwargs):
        c_out, c_in = [append_dims(c, x.ndim) for c in eps_scalings(sigma)]
        t = sigma_to_t(log_sigmas, sigma, quantize=quantize)
        eps = model_apply(params, x * c_in, t, **kwargs)
        return x + eps * c_out
    return denoise


def make_discrete_v_denoiser(model_apply: Callable, log_sigmas: jnp.ndarray,
                             quantize: bool = False,
                             sigma_data: float = 1.0) -> Callable:
    """Discrete-schedule v-prediction denoiser
    (ref: k_diffusion/external.py:182-218, DiscreteVDDPMDenoiser /
    CompVisVDenoiser)."""
    def denoise(params, x, sigma, **kwargs):
        c_skip, c_out, c_in = [append_dims(c, x.ndim)
                               for c in v_scalings(sigma, sigma_data)]
        t = sigma_to_t(log_sigmas, sigma, quantize=quantize)
        v = model_apply(params, x * c_in, t, **kwargs)
        return v * c_out + x * c_skip
    return denoise


def sigmas_from_alphas_cumprod(alphas_cumprod) -> jnp.ndarray:
    """Discrete sigma table from a DDPM model's alphas_cumprod:
    sigma_t = ((1 - abar_t) / abar_t) ** 0.5
    (ref: k_diffusion/external.py:92, 185 — the table both
    DiscreteEpsDDPMDenoiser and DiscreteVDDPMDenoiser derive)."""
    a = jnp.asarray(alphas_cumprod, jnp.float32)
    return ((1 - a) / a) ** 0.5


def make_compvis_eps_denoiser(model_apply: Callable, alphas_cumprod,
                              quantize: bool = False) -> Callable:
    """Named counterpart of the reference's CompVisDenoiser
    (ref: k_diffusion/external.py:172-179): a discrete eps denoiser whose
    sigma table comes from the wrapped model's alphas_cumprod. The
    reference routes through `model.apply_model(x, t, cond)`; here
    `model_apply(params, x_scaled, t, **kw)` plays that role (pass
    conditioning through **kw)."""
    log_sigmas = jnp.log(sigmas_from_alphas_cumprod(alphas_cumprod))
    return make_discrete_eps_denoiser(model_apply, log_sigmas,
                                      quantize=quantize)


def make_compvis_v_denoiser(model_apply: Callable, alphas_cumprod,
                            quantize: bool = False) -> Callable:
    """Named counterpart of CompVisVDenoiser / DiscreteVDDPMDenoiser
    (ref: k_diffusion/external.py:182-231); sigma_data is fixed at 1 like
    the reference (external.py:188)."""
    log_sigmas = jnp.log(sigmas_from_alphas_cumprod(alphas_cumprod))
    return make_discrete_v_denoiser(model_apply, log_sigmas,
                                    quantize=quantize, sigma_data=1.0)


def schedule_sigmas(log_sigmas: jnp.ndarray, n: Optional[int] = None) -> jnp.ndarray:
    """Sampling schedule from a discrete sigma table
    (ref: k_diffusion/external.py:60-65 DiscreteSchedule.get_sigmas):
    descending, zero-terminated; interpolated when n is given."""
    from .schedules import append_zero
    sigmas = jnp.exp(log_sigmas)
    if n is None:
        return append_zero(sigmas[::-1])
    t_max = log_sigmas.shape[0] - 1
    t = jnp.linspace(t_max, 0, n)
    return append_zero(t_to_sigma(log_sigmas, t))
