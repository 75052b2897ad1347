"""Noise-level (sigma) schedules and ODE helpers.

TPU-native reimplementation of the Karras-style schedules used by the
reference (`k_diffusion/sampling.py:13-58`). All functions are pure and
return `jnp` arrays so they can be folded into jitted programs.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def append_zero(x: jnp.ndarray) -> jnp.ndarray:
    """Appends a final zero sigma (ref: k_diffusion/sampling.py:13)."""
    return jnp.concatenate([x, jnp.zeros_like(x[:1])])


def get_sigmas_karras(n: int, sigma_min: float, sigma_max: float, rho: float = 7.0,
                      dtype=jnp.float32) -> jnp.ndarray:
    """Noise schedule of Karras et al. (2022) (ref: k_diffusion/sampling.py:17-23)."""
    ramp = jnp.linspace(0, 1, n, dtype=jnp.float64 if dtype == jnp.float64 else jnp.float32)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return append_zero(sigmas).astype(dtype)


def get_sigmas_exponential(n: int, sigma_min: float, sigma_max: float,
                           dtype=jnp.float32) -> jnp.ndarray:
    """Exponential noise schedule (ref: k_diffusion/sampling.py:26-29)."""
    sigmas = jnp.exp(jnp.linspace(math.log(sigma_max), math.log(sigma_min), n))
    return append_zero(sigmas).astype(dtype)


def get_sigmas_polyexponential(n: int, sigma_min: float, sigma_max: float,
                               rho: float = 1.0, dtype=jnp.float32) -> jnp.ndarray:
    """Polynomial-in-log-sigma schedule (ref: k_diffusion/sampling.py:32-36)."""
    ramp = jnp.linspace(1, 0, n) ** rho
    sigmas = jnp.exp(ramp * (math.log(sigma_max) - math.log(sigma_min)) + math.log(sigma_min))
    return append_zero(sigmas).astype(dtype)


def get_sigmas_vp(n: int, beta_d: float = 19.9, beta_min: float = 0.1,
                  eps_s: float = 1e-3, dtype=jnp.float32) -> jnp.ndarray:
    """Continuous VP noise schedule (ref: k_diffusion/sampling.py:39-43)."""
    t = jnp.linspace(1, eps_s, n)
    sigmas = jnp.sqrt(jnp.exp(beta_d * t ** 2 / 2 + beta_min * t) - 1)
    return append_zero(sigmas).astype(dtype)


def append_dims(x: jnp.ndarray, target_ndim: int) -> jnp.ndarray:
    """Appends trailing singleton dims until `x.ndim == target_ndim`
    (ref: k_diffusion/utils.py:40-46)."""
    x = jnp.asarray(x)
    dims_to_append = target_ndim - x.ndim
    if dims_to_append < 0:
        raise ValueError(f"input has {x.ndim} dims but target_ndim is {target_ndim}, which is less")
    return x[(...,) + (None,) * dims_to_append]


def to_d(x: jnp.ndarray, sigma: jnp.ndarray, denoised: jnp.ndarray) -> jnp.ndarray:
    """Denoiser output -> Karras ODE derivative (ref: k_diffusion/sampling.py:46-48)."""
    return (x - denoised) / append_dims(sigma, x.ndim)


def get_ancestral_step(sigma_from, sigma_to, eta: float = 1.0):
    """sigma_down / sigma_up split for an ancestral step
    (ref: k_diffusion/sampling.py:51-58). Works on traced values."""
    if not eta:
        return sigma_to, jnp.zeros_like(jnp.asarray(sigma_to))
    sigma_from = jnp.asarray(sigma_from)
    sigma_to = jnp.asarray(sigma_to)
    sigma_up = jnp.minimum(
        sigma_to,
        eta * (sigma_to ** 2 * (sigma_from ** 2 - sigma_to ** 2) / sigma_from ** 2) ** 0.5,
    )
    sigma_down = (sigma_to ** 2 - sigma_up ** 2) ** 0.5
    return sigma_down, sigma_up
