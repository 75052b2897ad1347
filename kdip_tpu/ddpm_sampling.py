"""Discrete-time DDPM sampling loops, VLB losses, and classifier guidance.

Completes the GaussianDiffusion capability surface
(ref: guided_diffusion/gaussian_diffusion.py:356-893 and losses.py):
ancestral `p_sample_loop`, `ddim_sample_loop`, classifier-guidance hooks
(`condition_mean`, `condition_score`), `training_losses` (MSE / VB), and
`calc_bpd_loop` — each as a jitted `lax.scan`/pure function over the
`DiffusionTables` pytree instead of a Python loop of tensor ops.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .diffusion import (DiffusionTables, extract, p_mean_variance,
                        predict_eps_from_xstart, predict_xstart_from_eps,
                        q_posterior_mean_variance, q_sample)


# ---------------------------------------------------------------------------
# VLB losses (ref: guided_diffusion/losses.py)
# ---------------------------------------------------------------------------

def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N1 || N2) in nats (ref: losses.py:12-39)."""
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def approx_standard_normal_cdf(x):
    """(ref: losses.py:42-47)"""
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi)
                                 * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a discretized Gaussian on [-1,1] 8-bit bins
    (ref: losses.py:50-77)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.clip(cdf_delta, min=1e-12))))
    return log_probs


def _mean_flat(x):
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


# ---------------------------------------------------------------------------
# Classifier guidance hooks (ref: gaussian_diffusion.py:356-393)
# ---------------------------------------------------------------------------

def condition_mean(tables: DiffusionTables, cond_fn, p_mean_var: Dict, x, t):
    """Shifts the reverse mean by variance * grad log p(y|x)
    (ref: gaussian_diffusion.py:356-369)."""
    gradient = cond_fn(x, t)
    return p_mean_var["mean"] + p_mean_var["variance"] * gradient


def condition_score(tables: DiffusionTables, cond_fn, p_mean_var: Dict, x, t):
    """Score-based conditioning (Song et al.)
    (ref: gaussian_diffusion.py:371-393)."""
    nd = x.ndim
    alpha_bar = extract(tables.alphas_cumprod, t, nd)
    eps = predict_eps_from_xstart(tables, x, t, p_mean_var["pred_xstart"])
    eps = eps - jnp.sqrt(1 - alpha_bar) * cond_fn(x, t)
    out = dict(p_mean_var)
    out["pred_xstart"] = predict_xstart_from_eps(tables, x, t, eps)
    out["mean"], _, _ = q_posterior_mean_variance(tables, out["pred_xstart"], x, t)
    return out


# ---------------------------------------------------------------------------
# Ancestral sampling (ref: gaussian_diffusion.py:395-495)
# ---------------------------------------------------------------------------

def p_sample(tables: DiffusionTables, model_fn: Callable, x, t, key,
             clip_denoised: bool = True, cond_fn: Optional[Callable] = None,
             learn_sigma: bool = True, predict_xstart: bool = False,
             sigma_small: bool = False):
    """One ancestral reverse step (ref: gaussian_diffusion.py:395-439)."""
    model_output = model_fn(x, t)
    out = p_mean_variance(tables, model_output, x, t, clip_denoised,
                          learn_sigma, predict_xstart=predict_xstart,
                          sigma_small=sigma_small)
    if cond_fn is not None:
        out["mean"] = condition_mean(tables, cond_fn, out, x, t)
    noise = jax.random.normal(key, x.shape, x.dtype)
    nonzero_mask = (t != 0).reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
    sample = out["mean"] + nonzero_mask * jnp.exp(0.5 * out["log_variance"]) * noise
    return sample, out["pred_xstart"]


def p_sample_loop(tables: DiffusionTables, model_fn: Callable, shape, key,
                  clip_denoised: bool = True, cond_fn: Optional[Callable] = None,
                  noise=None, learn_sigma: bool = True,
                  predict_xstart: bool = False, sigma_small: bool = False):
    """Full ancestral chain as one lax.scan
    (ref: gaussian_diffusion.py:441-495)."""
    k_init, k_loop = jax.random.split(key)
    x = jax.random.normal(k_init, shape) if noise is None else noise
    T = tables.num_timesteps

    def step(carry, t_rev):
        x, k = carry
        k, k_step = jax.random.split(k)
        t = jnp.full((shape[0],), t_rev, jnp.int32)
        x, _ = p_sample(tables, model_fn, x, t, k_step, clip_denoised, cond_fn,
                        learn_sigma, predict_xstart, sigma_small)
        return (x, k), None

    (x, _), _ = lax.scan(step, (x, k_loop), jnp.arange(T - 1, -1, -1))
    return x


# ---------------------------------------------------------------------------
# DDIM sampling (ref: gaussian_diffusion.py:497-682)
# ---------------------------------------------------------------------------

def ddim_sample(tables: DiffusionTables, model_fn: Callable, x, t, key,
                eta: float = 0.0, clip_denoised: bool = True,
                cond_fn: Optional[Callable] = None, learn_sigma: bool = True,
                predict_xstart: bool = False, sigma_small: bool = False):
    """One DDIM step (ref: gaussian_diffusion.py:497-546)."""
    model_output = model_fn(x, t)
    out = p_mean_variance(tables, model_output, x, t, clip_denoised,
                          learn_sigma, predict_xstart=predict_xstart,
                          sigma_small=sigma_small)
    if cond_fn is not None:
        out = condition_score(tables, cond_fn, out, x, t)
    nd = x.ndim
    eps = predict_eps_from_xstart(tables, x, t, out["pred_xstart"])
    alpha_bar = extract(tables.alphas_cumprod, t, nd)
    alpha_bar_prev = extract(tables.alphas_cumprod_prev, t, nd)
    sigma = (eta * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
             * jnp.sqrt(1 - alpha_bar / alpha_bar_prev))
    noise = jax.random.normal(key, x.shape, x.dtype)
    mean_pred = (out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
                 + jnp.sqrt(1 - alpha_bar_prev - sigma ** 2) * eps)
    nonzero_mask = (t != 0).reshape((-1,) + (1,) * (nd - 1)).astype(x.dtype)
    return mean_pred + nonzero_mask * sigma * noise, out["pred_xstart"]


def ddim_sample_loop(tables: DiffusionTables, model_fn: Callable, shape, key,
                     eta: float = 0.0, clip_denoised: bool = True,
                     cond_fn: Optional[Callable] = None, noise=None,
                     learn_sigma: bool = True, predict_xstart: bool = False,
                     sigma_small: bool = False):
    """(ref: gaussian_diffusion.py:625-682)"""
    k_init, k_loop = jax.random.split(key)
    x = jax.random.normal(k_init, shape) if noise is None else noise
    T = tables.num_timesteps

    def step(carry, t_rev):
        x, k = carry
        k, k_step = jax.random.split(k)
        t = jnp.full((shape[0],), t_rev, jnp.int32)
        x, _ = ddim_sample(tables, model_fn, x, t, k_step, eta, clip_denoised,
                           cond_fn, learn_sigma, predict_xstart, sigma_small)
        return (x, k), None

    (x, _), _ = lax.scan(step, (x, k_loop), jnp.arange(T - 1, -1, -1))
    return x


# ---------------------------------------------------------------------------
# Training losses (ref: gaussian_diffusion.py:696-835) and BPD
# ---------------------------------------------------------------------------

def vb_terms_bpd(tables: DiffusionTables, model_fn: Callable, x_start, x_t, t,
                 clip_denoised: bool = True, learn_sigma: bool = True,
                 frozen_mean: bool = False, predict_xstart: bool = False,
                 sigma_small: bool = False):
    """Variational bound term for one timestep, in bits-per-dim
    (ref: gaussian_diffusion.py:696-742)."""
    true_mean, _, true_log_var = q_posterior_mean_variance(tables, x_start, x_t, t)
    model_output = model_fn(x_t, t)
    if frozen_mean and learn_sigma:
        # RESCALED_MSE freezes the mean contribution in the VB term
        # (ref: gaussian_diffusion.py:771-780)
        C = x_t.shape[-1]
        eps = lax.stop_gradient(model_output[..., :C])
        model_output = jnp.concatenate([eps, model_output[..., C:]], axis=-1)
    out = p_mean_variance(tables, model_output, x_t, t, clip_denoised,
                          learn_sigma, predict_xstart=predict_xstart,
                          sigma_small=sigma_small)
    kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
    kl = _mean_flat(kl) / math.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=out["mean"], log_scales=0.5 * out["log_variance"])
    decoder_nll = _mean_flat(decoder_nll) / math.log(2.0)
    output = jnp.where(t == 0, decoder_nll, kl)
    return {"output": output, "pred_xstart": out["pred_xstart"]}


def training_losses(tables: DiffusionTables, model_fn: Callable, x_start, t,
                    key, loss_type: str = "mse", learn_sigma: bool = True,
                    noise=None, predict_xstart: bool = False,
                    sigma_small: bool = False):
    """MSE / rescaled-MSE / KL training losses
    (ref: gaussian_diffusion.py:744-835). loss_type in
    {mse, rescaled_mse, kl, rescaled_kl}. With `predict_xstart` (the
    START_X mean type, ref: gaussian_diffusion.py:787-796) the MSE target
    is x_start instead of the noise."""
    if noise is None:
        noise = jax.random.normal(key, x_start.shape, x_start.dtype)
    x_t = q_sample(tables, x_start, t, noise)
    terms = {}
    T = tables.num_timesteps
    if loss_type in ("kl", "rescaled_kl"):
        terms["loss"] = vb_terms_bpd(tables, model_fn, x_start, x_t, t,
                                     clip_denoised=False,
                                     learn_sigma=learn_sigma,
                                     predict_xstart=predict_xstart,
                                     sigma_small=sigma_small)["output"]
        if loss_type == "rescaled_kl":
            terms["loss"] = terms["loss"] * T
        return terms
    model_output = model_fn(x_t, t)
    if learn_sigma:
        terms["vb"] = vb_terms_bpd(tables, lambda *_: model_output, x_start,
                                   x_t, t, clip_denoised=False,
                                   learn_sigma=True, frozen_mean=True,
                                   predict_xstart=predict_xstart,
                                   sigma_small=sigma_small)["output"]
        if loss_type == "rescaled_mse":
            terms["vb"] = terms["vb"] * T / 1000.0
        mean_pred = model_output[..., :x_start.shape[-1]]
    else:
        mean_pred = model_output
    target = x_start if predict_xstart else noise
    terms["mse"] = _mean_flat((target - mean_pred) ** 2)
    terms["loss"] = terms["mse"] + terms.get("vb", 0.0)
    return terms


def prior_bpd(tables: DiffusionTables, x_start):
    """KL(q(x_T | x_0) || N(0, I)) in bpd (ref: gaussian_diffusion.py:818-835)."""
    B = x_start.shape[0]
    t = jnp.full((B,), tables.num_timesteps - 1, jnp.int32)
    nd = x_start.ndim
    qt_mean = extract(tables.sqrt_alphas_cumprod, t, nd) * x_start
    qt_log_var = jnp.log(1.0 - extract(tables.alphas_cumprod, t, nd))
    kl_prior = normal_kl(qt_mean, qt_log_var, 0.0, 0.0)
    return _mean_flat(kl_prior) / math.log(2.0)


def calc_bpd_loop(tables: DiffusionTables, model_fn: Callable, x_start, key,
                  clip_denoised: bool = True, learn_sigma: bool = True):
    """Total VLB evaluation over all timesteps as one scan
    (ref: gaussian_diffusion.py:837-893)."""
    B = x_start.shape[0]
    T = tables.num_timesteps

    def step(carry, t_rev):
        k = carry
        k, k_step = jax.random.split(k)
        t = jnp.full((B,), t_rev, jnp.int32)
        noise = jax.random.normal(k_step, x_start.shape, x_start.dtype)
        x_t = q_sample(tables, x_start, t, noise)
        out = vb_terms_bpd(tables, model_fn, x_start, x_t, t, clip_denoised,
                           learn_sigma)
        eps = predict_eps_from_xstart(tables, x_t, t, out["pred_xstart"])
        xstart_mse = _mean_flat((out["pred_xstart"] - x_start) ** 2)
        mse = _mean_flat((eps - noise) ** 2)
        return k, (out["output"], xstart_mse, mse)

    _, (vb, xstart_mse, mse) = lax.scan(step, key, jnp.arange(T - 1, -1, -1))
    total_bpd = vb.sum(axis=0) + prior_bpd(tables, x_start)
    return {"total_bpd": total_bpd, "prior_bpd": prior_bpd(tables, x_start),
            "vb": vb.T, "xstart_mse": xstart_mse.T, "mse": mse.T}
