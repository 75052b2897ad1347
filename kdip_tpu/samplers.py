"""Karras-family samplers as jitted `lax.scan` programs.

TPU-native reimplementation of the reference sampler zoo
(`k_diffusion/sampling.py:118-649`). Instead of Python loops calling the
model step-by-step, each sampler compiles the *entire* trajectory into one
XLA program: per-step scalars (sigma pairs, churn gammas) are precomputed as
scan inputs, data-dependent branches (`sigma_next == 0`) become `lax.cond`,
and randomness is explicit key-threading.

All samplers share the signature
    sample_X(denoise, x, sigmas, key, **opts) -> x0
where `denoise(x, sigma, key) -> x0` is any Karras denoiser (unconditional or
guided), `x` is the initial noise `randn * sigma_max`, and `sigmas` is a
descending schedule ending in 0 (see `schedules.get_sigmas_karras`).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from .brownian import BrownianTreeNoiseSampler
from .schedules import get_ancestral_step, to_d


def default_noise_sampler(key, shape, dtype=jnp.float32):
    """Per-call iid Gaussian noise (ref: k_diffusion/sampling.py:61-62)."""
    def sampler(step_key, sigma, sigma_next):
        return jax.random.normal(step_key, shape, dtype)
    return sampler


def _churn_gammas(sigmas, s_churn, s_tmin, s_tmax):
    """Per-step churn gamma (ref: k_diffusion/sampling.py:123, 164)."""
    n = sigmas.shape[0] - 1
    gamma_max = min(s_churn / n, 2 ** 0.5 - 1)
    return jnp.where((sigmas[:-1] >= s_tmin) & (sigmas[:-1] <= s_tmax), gamma_max, 0.0)


def _split3(key):
    return jax.random.split(key, 3)


def _info_call(denoise: Callable, return_info: bool, warm: bool = False):
    """Normalizes a denoiser to `(denoised, cg_resid, state)` calls. With
    return_info, the denoiser must be info-returning (built with
    guidance.make_condition_denoiser(..., with_info=True)); otherwise the
    residual slot is a constant 0 that folds away in compilation. warm=True
    additionally threads the CG warm-start carry (the denoiser must be
    built with GuidanceConfig.cg_warm_start and takes/returns
    solver_state); otherwise the state slot passes through untouched — a
    dummy scalar that also folds away."""
    if warm:
        def call(x, sigma, key, st):
            denoised, info = denoise(x, sigma, key, solver_state=st)
            return denoised, info["cg_resid"], info["solver_state"]
    elif return_info:
        def call(x, sigma, key, st):
            denoised, info = denoise(x, sigma, key)
            return denoised, info["cg_resid"], st
    else:
        def call(x, sigma, key, st):
            return denoise(x, sigma, key), jnp.float32(0.0), st
    return call


def sample_euler(denoise: Callable, x, sigmas, key, s_churn=0.0, s_tmin=0.0,
                 s_tmax=float("inf"), s_noise=1.0, return_info=False,
                 solver_state=None):
    """Algorithm 2 (Euler steps) of Karras et al.
    (ref: k_diffusion/sampling.py:118-135).

    return_info=True expects an info-returning denoiser (see
    guidance.make_condition_denoiser with_info) and returns (x, info) with
    info["cg_max_residual"] = the worst CG relative residual over the whole
    trajectory. solver_state (a pytree from guidance.init_solver_state)
    enables the CG warm-start carry: the denoiser must be built with
    GuidanceConfig.cg_warm_start, and info additionally reports
    "cg_total_iters" summed over the trajectory."""
    gammas = _churn_gammas(sigmas, s_churn, s_tmin, s_tmax)
    warm = solver_state is not None
    call = _info_call(denoise, return_info, warm=warm)
    st0 = solver_state if warm else jnp.float32(0.0)

    def step(carry, inp):
        x, key, worst, st, iters = carry
        sigma, sigma_next, gamma = inp
        key, k_churn, k_model = _split3(key)
        eps = jax.random.normal(k_churn, x.shape, x.dtype) * s_noise
        sigma_hat = sigma * (gamma + 1)
        bump = jnp.sqrt(jnp.maximum(sigma_hat ** 2 - sigma ** 2, 0.0))
        x = jnp.where(gamma > 0, x + eps * bump, x)
        denoised, resid, st = call(x, sigma_hat, k_model, st)
        if warm:
            iters = iters + jnp.sum(st["iters"])
        d = to_d(x, sigma_hat, denoised)
        x = x + d * (sigma_next - sigma_hat)
        return (x, key, jnp.maximum(worst, resid), st, iters), None

    (x, _, worst, _, iters), _ = lax.scan(
        step, (x, key, jnp.float32(0.0), st0, jnp.int32(0)),
        (sigmas[:-1], sigmas[1:], gammas))
    if return_info:
        info = {"cg_max_residual": worst}
        if warm:
            info["cg_total_iters"] = iters
        return x, info
    return x


def sample_heun(denoise: Callable, x, sigmas, key, s_churn=0.0, s_tmin=0.0,
                s_tmax=float("inf"), s_noise=1.0, return_info=False,
                solver_state=None):
    """Algorithm 2 (Heun steps) of Karras et al. — the reference's default
    guided sampler (ref: k_diffusion/sampling.py:159-184).

    return_info=True expects an info-returning denoiser (see
    guidance.make_condition_denoiser with_info) and returns (x, info) with
    info["cg_max_residual"] = the worst CG relative residual over the whole
    trajectory. solver_state (a pytree from guidance.init_solver_state)
    enables the CG warm-start carry (GuidanceConfig.cg_warm_start): both
    denoiser calls in a step seed from the latest solve — the corrector
    call warm-starts from the predictor's iterate — and info additionally
    reports "cg_total_iters" summed over the trajectory."""
    gammas = _churn_gammas(sigmas, s_churn, s_tmin, s_tmax)
    warm = solver_state is not None
    call = _info_call(denoise, return_info, warm=warm)
    st0 = solver_state if warm else jnp.float32(0.0)

    def step(carry, inp):
        x, key, worst, st, iters = carry
        sigma, sigma_next, gamma = inp
        key, k_churn, k_model, k_model2 = jax.random.split(key, 4)
        eps = jax.random.normal(k_churn, x.shape, x.dtype) * s_noise
        sigma_hat = sigma * (gamma + 1)
        bump = jnp.sqrt(jnp.maximum(sigma_hat ** 2 - sigma ** 2, 0.0))
        x = jnp.where(gamma > 0, x + eps * bump, x)
        denoised, resid, st = call(x, sigma_hat, k_model, st)
        if warm:
            iters = iters + jnp.sum(st["iters"])
        d = to_d(x, sigma_hat, denoised)
        dt = sigma_next - sigma_hat

        def euler_branch(args):
            x, st = args
            if warm:
                # no corrector solve ran: zero the per-call iter count so the
                # post-cond accumulation doesn't re-add the predictor's
                st = dict(st, iters=jnp.zeros_like(st["iters"]))
            return x + d * dt, jnp.float32(0.0), st

        def heun_branch(args):
            x, st = args
            x_2 = x + d * dt
            denoised_2, resid_2, st = call(x_2, sigma_next, k_model2, st)
            d_2 = to_d(x_2, sigma_next, denoised_2)
            return x + (d + d_2) / 2 * dt, resid_2, st

        x, resid_2, st = lax.cond(sigma_next == 0, euler_branch, heun_branch,
                                  (x, st))
        if warm:
            iters = iters + jnp.sum(st["iters"])
        worst = jnp.maximum(worst, jnp.maximum(resid, resid_2))
        return (x, key, worst, st, iters), None

    (x, _, worst, _, iters), _ = lax.scan(
        step, (x, key, jnp.float32(0.0), st0, jnp.int32(0)),
        (sigmas[:-1], sigmas[1:], gammas))
    if return_info:
        info = {"cg_max_residual": worst}
        if warm:
            info["cg_total_iters"] = iters
        return x, info
    return x


def sample_euler_ancestral(denoise: Callable, x, sigmas, key, eta=1.0, s_noise=1.0,
                           noise_sampler=None):
    """Ancestral sampling with Euler steps (ref: k_diffusion/sampling.py:139-155)."""
    ns = noise_sampler or default_noise_sampler(key, x.shape, x.dtype)

    def step(carry, inp):
        x, key = carry
        sigma, sigma_next = inp
        key, k_noise, k_model = _split3(key)
        denoised = denoise(x, sigma, k_model)
        sigma_down, sigma_up = get_ancestral_step(sigma, sigma_next, eta=eta)
        d = to_d(x, sigma, denoised)
        x = x + d * (sigma_down - sigma)
        noise = ns(k_noise, sigma, sigma_next)
        x = jnp.where(sigma_next > 0, x + noise * s_noise * sigma_up, x)
        return (x, key), None

    (x, _), _ = lax.scan(step, (x, key), (sigmas[:-1], sigmas[1:]))
    return x


def sample_dpm_2(denoise: Callable, x, sigmas, key, s_churn=0.0, s_tmin=0.0,
                 s_tmax=float("inf"), s_noise=1.0):
    """DPM-Solver-2 / Algorithm 2 hybrid (ref: k_diffusion/sampling.py:187-214)."""
    gammas = _churn_gammas(sigmas, s_churn, s_tmin, s_tmax)

    def step(carry, inp):
        x, key = carry
        sigma, sigma_next, gamma = inp
        key, k_churn, k_model, k_model2 = jax.random.split(key, 4)
        eps = jax.random.normal(k_churn, x.shape, x.dtype) * s_noise
        sigma_hat = sigma * (gamma + 1)
        bump = jnp.sqrt(jnp.maximum(sigma_hat ** 2 - sigma ** 2, 0.0))
        x = jnp.where(gamma > 0, x + eps * bump, x)
        denoised = denoise(x, sigma_hat, k_model)
        d = to_d(x, sigma_hat, denoised)

        def euler_branch(x):
            return x + d * (sigma_next - sigma_hat)

        def dpm2_branch(x):
            log_mid = (jnp.log(sigma_hat) + jnp.log(sigma_next)) / 2
            sigma_mid = jnp.exp(log_mid)
            x_2 = x + d * (sigma_mid - sigma_hat)
            denoised_2 = denoise(x_2, sigma_mid, k_model2)
            d_2 = to_d(x_2, sigma_mid, denoised_2)
            return x + d_2 * (sigma_next - sigma_hat)

        x = lax.cond(sigma_next == 0, euler_branch, dpm2_branch, x)
        return (x, key), None

    (x, _), _ = lax.scan(step, (x, key), (sigmas[:-1], sigmas[1:], gammas))
    return x


def sample_dpm_2_ancestral(denoise: Callable, x, sigmas, key, eta=1.0, s_noise=1.0,
                           noise_sampler=None):
    """Ancestral DPM-Solver-2 (ref: k_diffusion/sampling.py:218-243)."""
    ns = noise_sampler or default_noise_sampler(key, x.shape, x.dtype)

    def step(carry, inp):
        x, key = carry
        sigma, sigma_next = inp
        key, k_noise, k_model, k_model2 = jax.random.split(key, 4)
        denoised = denoise(x, sigma, k_model)
        sigma_down, sigma_up = get_ancestral_step(sigma, sigma_next, eta=eta)
        d = to_d(x, sigma, denoised)

        def euler_branch(x):
            return x + d * (sigma_down - sigma)

        def dpm2_branch(x):
            sigma_mid = jnp.exp((jnp.log(sigma) + jnp.log(sigma_down)) / 2)
            x_2 = x + d * (sigma_mid - sigma)
            denoised_2 = denoise(x_2, sigma_mid, k_model2)
            d_2 = to_d(x_2, sigma_mid, denoised_2)
            x = x + d_2 * (sigma_down - sigma)
            return x + ns(k_noise, sigma, sigma_next) * s_noise * sigma_up

        x = lax.cond(sigma_down == 0, euler_branch, dpm2_branch, x)
        return (x, key), None

    (x, _), _ = lax.scan(step, (x, key), (sigmas[:-1], sigmas[1:]))
    return x


def linear_multistep_coeff(order, t, i, j):
    """Integrated Lagrange-basis LMS coefficient
    (ref: k_diffusion/sampling.py:246-256). Host-side numerics."""
    from scipy import integrate
    if order - 1 > i:
        raise ValueError(f"LMS order {order} exceeds the {i} steps available")

    def fn(tau):
        prod = 1.0
        for k in range(order):
            if j == k:
                continue
            prod *= (tau - t[i - k]) / (t[i - j] - t[i - k])
        return prod

    return integrate.quad(fn, t[i], t[i + 1], epsrel=1e-4)[0]


def sample_lms(denoise: Callable, x, sigmas, key, order: int = 4):
    """Linear multistep sampler (ref: k_diffusion/sampling.py:259-275).

    LMS coefficients depend only on the (concrete) sigma schedule, so they are
    precomputed host-side into a dense [n, order] table and the trajectory
    still runs as a single scan with a rolling derivative history buffer.
    """
    import numpy as np
    sigmas_np = np.asarray(sigmas)
    n = len(sigmas_np) - 1
    coeff_table = np.zeros((n, order), dtype=np.float32)
    for i in range(n):
        cur_order = min(i + 1, order)
        for j in range(cur_order):
            coeff_table[i, j] = linear_multistep_coeff(cur_order, sigmas_np, i, j)
    coeff_table = jnp.asarray(coeff_table)

    ds_init = jnp.zeros((order,) + x.shape, x.dtype)

    def step(carry, inp):
        x, ds, key = carry
        sigma, coeffs = inp
        key, k_model = jax.random.split(key)
        denoised = denoise(x, sigma, k_model)
        d = to_d(x, sigma, denoised)
        # ds[0] is the newest derivative (matches reversed(ds) in the ref).
        ds = jnp.concatenate([d[None], ds[:-1]], axis=0)
        x = x + jnp.tensordot(coeffs, ds, axes=1)
        return (x, ds, key), None

    (x, _, _), _ = lax.scan(step, (x, ds_init, key), (sigmas[:-1], coeff_table))
    return x


def sample_dpmpp_2s_ancestral(denoise: Callable, x, sigmas, key, eta=1.0, s_noise=1.0,
                              noise_sampler=None):
    """DPM-Solver++(2S) ancestral (ref: k_diffusion/sampling.py:507-537)."""
    ns = noise_sampler or default_noise_sampler(key, x.shape, x.dtype)
    sigma_fn = lambda t: jnp.exp(-t)
    t_fn = lambda sigma: -jnp.log(sigma)

    def step(carry, inp):
        x, key = carry
        sigma, sigma_next = inp
        key, k_noise, k_model, k_model2 = jax.random.split(key, 4)
        denoised = denoise(x, sigma, k_model)
        sigma_down, sigma_up = get_ancestral_step(sigma, sigma_next, eta=eta)

        def euler_branch(x):
            d = to_d(x, sigma, denoised)
            return x + d * (sigma_down - sigma)

        def dpmpp_branch(x):
            t, t_next = t_fn(sigma), t_fn(sigma_down)
            r = 1 / 2
            h = t_next - t
            s = t + r * h
            x_2 = (sigma_fn(s) / sigma_fn(t)) * x - jnp.expm1(-h * r) * denoised
            denoised_2 = denoise(x_2, sigma_fn(s), k_model2)
            return (sigma_fn(t_next) / sigma_fn(t)) * x - jnp.expm1(-h) * denoised_2

        x = lax.cond(sigma_down == 0, euler_branch, dpmpp_branch, x)
        noise = ns(k_noise, sigma, sigma_next)
        x = jnp.where(sigma_next > 0, x + noise * s_noise * sigma_up, x)
        return (x, key), None

    (x, _), _ = lax.scan(step, (x, key), (sigmas[:-1], sigmas[1:]))
    return x


def sample_dpmpp_sde(denoise: Callable, x, sigmas, key, eta=1.0, s_noise=1.0,
                     noise_sampler=None, r=1 / 2):
    """DPM-Solver++ (stochastic) (ref: k_diffusion/sampling.py:541-579)."""
    if noise_sampler is None:
        import numpy as np
        sig_np = np.asarray(sigmas)
        sigma_min = float(sig_np[sig_np > 0].min())
        sigma_max = float(sig_np.max())
        key, tree_key = jax.random.split(key)
        ns = BrownianTreeNoiseSampler(x.shape, sigma_min, sigma_max, tree_key, x.dtype)
        noise_fn = lambda step_key, s0, s1: ns(s0, s1)
    else:
        noise_fn = noise_sampler
    sigma_fn = lambda t: jnp.exp(-t)
    t_fn = lambda sigma: -jnp.log(sigma)

    def step(carry, inp):
        x, key = carry
        sigma, sigma_next = inp
        key, k_n1, k_n2, k_model, k_model2 = jax.random.split(key, 5)
        denoised = denoise(x, sigma, k_model)

        def euler_branch(x):
            d = to_d(x, sigma, denoised)
            return x + d * (sigma_next - sigma)

        def dpmpp_branch(x):
            t, t_next = t_fn(sigma), t_fn(sigma_next)
            h = t_next - t
            s = t + h * r
            fac = 1 / (2 * r)
            # Step 1
            sd, su = get_ancestral_step(sigma_fn(t), sigma_fn(s), eta)
            s_ = t_fn(sd)
            x_2 = (sigma_fn(s_) / sigma_fn(t)) * x - jnp.expm1(t - s_) * denoised
            x_2 = x_2 + noise_fn(k_n1, sigma_fn(t), sigma_fn(s)) * s_noise * su
            denoised_2 = denoise(x_2, sigma_fn(s), k_model2)
            # Step 2
            sd, su = get_ancestral_step(sigma_fn(t), sigma_fn(t_next), eta)
            t_next_ = t_fn(sd)
            denoised_d = (1 - fac) * denoised + fac * denoised_2
            x = (sigma_fn(t_next_) / sigma_fn(t)) * x - jnp.expm1(t - t_next_) * denoised_d
            return x + noise_fn(k_n2, sigma_fn(t), sigma_fn(t_next)) * s_noise * su

        x = lax.cond(sigma_next == 0, euler_branch, dpmpp_branch, x)
        return (x, key), None

    (x, _), _ = lax.scan(step, (x, key), (sigmas[:-1], sigmas[1:]))
    return x


def sample_dpmpp_2m(denoise: Callable, x, sigmas, key, return_info=False):
    """DPM-Solver++(2M) (ref: k_diffusion/sampling.py:583-605).

    return_info=True expects an info-returning denoiser (see
    guidance.make_condition_denoiser with_info) and returns (x, info) with
    info["cg_max_residual"] = the worst CG relative residual over the whole
    trajectory."""
    t_fn = lambda sigma: -jnp.log(sigma)
    n = sigmas.shape[0] - 1
    # sigma at i-1 for the multistep ratio; step 0 has no history (flag below).
    sigma_prevs = jnp.concatenate([sigmas[:1], sigmas[:-1]])
    steps = jnp.arange(n)
    call = _info_call(denoise, return_info)

    def step(carry, inp):
        x, old_denoised, key, worst = carry
        i, sigma_prev, sigma, sigma_next = inp
        key, k_model = jax.random.split(key)
        denoised, resid, _ = call(x, sigma, k_model, jnp.float32(0.0))
        t, t_next = t_fn(sigma), t_fn(sigma_next)
        h = t_next - t

        first_or_last = (i == 0) | (sigma_next == 0)

        def simple(args):
            x, denoised, old_denoised = args
            return (sigma_next / sigma) * x - jnp.expm1(-h) * denoised

        def multistep(args):
            x, denoised, old_denoised = args
            h_last = t - t_fn(sigma_prev)
            r_ = h_last / h
            denoised_d = (1 + 1 / (2 * r_)) * denoised - (1 / (2 * r_)) * old_denoised
            return (sigma_next / sigma) * x - jnp.expm1(-h) * denoised_d

        x = lax.cond(first_or_last, simple, multistep, (x, denoised, old_denoised))
        return (x, denoised, key, jnp.maximum(worst, resid)), None

    (x, _, _, worst), _ = lax.scan(
        step, (x, jnp.zeros_like(x), key, jnp.float32(0.0)),
        (steps, sigma_prevs[:n], sigmas[:-1], sigmas[1:]))
    if return_info:
        return x, {"cg_max_residual": worst}
    return x


def sample_dpmpp_2m_sde(denoise: Callable, x, sigmas, key, eta=1.0, s_noise=1.0,
                        noise_sampler=None, solver_type: str = "midpoint"):
    """DPM-Solver++(2M) SDE (ref: k_diffusion/sampling.py:609-649)."""
    if solver_type not in {"heun", "midpoint"}:
        raise ValueError("solver_type must be 'heun' or 'midpoint'")
    if noise_sampler is None:
        import numpy as np
        sig_np = np.asarray(sigmas)
        sigma_min = float(sig_np[sig_np > 0].min())
        sigma_max = float(sig_np.max())
        key, tree_key = jax.random.split(key)
        ns = BrownianTreeNoiseSampler(x.shape, sigma_min, sigma_max, tree_key, x.dtype)
        noise_fn = lambda step_key, s0, s1: ns(s0, s1)
    else:
        noise_fn = noise_sampler
    n = sigmas.shape[0] - 1
    steps = jnp.arange(n)

    def step(carry, inp):
        x, old_denoised, h_last, key = carry
        i, sigma, sigma_next = inp
        key, k_noise, k_model = _split3(key)
        denoised = denoise(x, sigma, k_model)

        def denoise_branch(args):
            x, h_last = args
            return denoised, jnp.zeros_like(h_last)

        def sde_branch(args):
            x, h_last = args
            t, s = -jnp.log(sigma), -jnp.log(sigma_next)
            h = s - t
            eta_h = eta * h
            x_new = (sigma_next / sigma * jnp.exp(-eta_h) * x
                     - jnp.expm1(-h - eta_h) * denoised)
            r_ = h_last / h
            if solver_type == "heun":
                corr = (jnp.expm1(-h - eta_h) / (-h - eta_h) * (-1) + 1) * (1 / r_)
            else:  # midpoint
                corr = 0.5 * (-jnp.expm1(-h - eta_h)) * (1 / r_)
            x_new = jnp.where(i > 0, x_new + corr * (denoised - old_denoised), x_new)
            noise_scale = sigma_next * jnp.sqrt(-jnp.expm1(-2 * eta_h))
            x_new = x_new + noise_fn(k_noise, sigma, sigma_next) * noise_scale * s_noise
            return x_new, h

        x, h_last = lax.cond(sigma_next == 0, denoise_branch, sde_branch, (x, h_last))
        return (x, denoised, h_last, key), None

    (x, _, _, _), _ = lax.scan(
        step, (x, jnp.zeros_like(x), jnp.ones((), x.dtype), key),
        (steps, sigmas[:-1], sigmas[1:]))
    return x


# ---------------------------------------------------------------------------
# DPM-Solver (fast / adaptive) — log-SNR time parametrization
# (ref: k_diffusion/sampling.py:331-503)
# ---------------------------------------------------------------------------

def _dpm_eps(denoise, x, t, key):
    sigma = jnp.exp(-t)
    return (x - denoise(x, sigma, key)) / sigma


def _dpm_solver_1_step(denoise, x, t, t_next, key, eps=None):
    h = t_next - t
    k1, _ = jax.random.split(key)
    eps = _dpm_eps(denoise, x, t, k1) if eps is None else eps
    x_1 = x - jnp.exp(-t_next) * jnp.expm1(h) * eps
    return x_1, eps


def _dpm_solver_2_step(denoise, x, t, t_next, key, r1=1 / 2, eps=None):
    h = t_next - t
    k1, k2 = jax.random.split(key)
    eps = _dpm_eps(denoise, x, t, k1) if eps is None else eps
    s1 = t + r1 * h
    u1 = x - jnp.exp(-s1) * jnp.expm1(r1 * h) * eps
    eps_r1 = _dpm_eps(denoise, u1, s1, k2)
    x_2 = (x - jnp.exp(-t_next) * jnp.expm1(h) * eps
           - jnp.exp(-t_next) / (2 * r1) * jnp.expm1(h) * (eps_r1 - eps))
    return x_2, eps


def _dpm_solver_3_step(denoise, x, t, t_next, key, r1=1 / 3, r2=2 / 3, eps=None):
    h = t_next - t
    k1, k2, k3 = jax.random.split(key, 3)
    eps = _dpm_eps(denoise, x, t, k1) if eps is None else eps
    s1 = t + r1 * h
    s2 = t + r2 * h
    u1 = x - jnp.exp(-s1) * jnp.expm1(r1 * h) * eps
    eps_r1 = _dpm_eps(denoise, u1, s1, k2)
    u2 = (x - jnp.exp(-s2) * jnp.expm1(r2 * h) * eps
          - jnp.exp(-s2) * (r2 / r1) * (jnp.expm1(r2 * h) / (r2 * h) - 1) * (eps_r1 - eps))
    eps_r2 = _dpm_eps(denoise, u2, s2, k3)
    x_3 = (x - jnp.exp(-t_next) * jnp.expm1(h) * eps
           - jnp.exp(-t_next) / r2 * (jnp.expm1(h) / h - 1) * (eps_r2 - eps))
    return x_3, eps


def sample_dpm_fast(denoise: Callable, x, sigma_min, sigma_max, n: int, key,
                    eta=0.0, s_noise=1.0):
    """DPM-Solver-Fast, fixed NFE budget (ref: k_diffusion/sampling.py:386-423, 480-488).

    Order pattern is static given `n`, so the whole plan unrolls at trace time
    into one XLA program.
    """
    if sigma_min <= 0 or sigma_max <= 0:
        raise ValueError("sigma_min and sigma_max must both be nonzero")
    t_start = -math.log(sigma_max)
    t_end = -math.log(sigma_min)
    m = math.floor(n / 3) + 1
    ts = jnp.linspace(t_start, t_end, m + 1)
    if n % 3 == 0:
        orders = [3] * (m - 2) + [2, 1]
    else:
        orders = [3] * (m - 1) + [n % 3]

    for i, order in enumerate(orders):
        key, k_step, k_noise = _split3(key)
        t, t_next = ts[i], ts[i + 1]
        if eta:
            sd, su = get_ancestral_step(jnp.exp(-t), jnp.exp(-t_next), eta)
            t_next_ = jnp.minimum(t_end, -jnp.log(sd))
            su = jnp.sqrt(jnp.clip(jnp.exp(-t_next) ** 2 - jnp.exp(-t_next_) ** 2, 0))
        else:
            t_next_, su = t_next, 0.0
        fn = {1: _dpm_solver_1_step, 2: _dpm_solver_2_step, 3: _dpm_solver_3_step}[order]
        x, _ = fn(denoise, x, t, t_next_, k_step)
        if eta:
            x = x + su * s_noise * jax.random.normal(k_noise, x.shape, x.dtype)
    return x


def log_likelihood(denoise: Callable, x, sigma_min, sigma_max, key,
                   steps: int = 100):
    """Exact-ODE log-likelihood of `x` under the model
    (ref: k_diffusion/sampling.py:279-299).

    Integrates the probability-flow ODE from sigma_min to sigma_max with the
    divergence term estimated by a fixed Hutchinson probe (Rademacher v,
    like the reference), accumulating the log-density change. The reference
    uses torchdiffeq dopri5; here the trajectory is a fixed-step RK4 scan in
    log-sigma (`steps` controls accuracy), keeping the whole evaluation one
    XLA program.

    Returns (ll [B], info dict with 'fevals').
    """
    B = x.shape[0]
    k_v, k_run = jax.random.split(key)
    v = jax.random.rademacher(k_v, x.shape, dtype=x.dtype)

    def ode_fn(x, sigma):
        def d_fn(xx):
            return to_d(xx, sigma, denoise(xx, sigma, None))
        d, vjp_fn = jax.vjp(d_fn, x)
        grad = vjp_fn(v)[0]
        d_ll = jnp.sum((v * grad).reshape(B, -1), axis=1)
        return d, d_ll

    # RK4 in t = log(sigma): dx/dt = sigma * dx/dsigma
    t0, t1 = math.log(sigma_min), math.log(sigma_max)
    h = (t1 - t0) / steps
    ts = t0 + h * jnp.arange(steps)

    def rhs(state, t):
        x, _ = state
        sigma = jnp.exp(t)
        d, d_ll = ode_fn(x, sigma)
        return d * sigma, d_ll * sigma

    def step(carry, t):
        x, ll = carry
        k1x, k1l = rhs((x, ll), t)
        k2x, k2l = rhs((x + h / 2 * k1x, ll), t + h / 2)
        k3x, k3l = rhs((x + h / 2 * k2x, ll), t + h / 2)
        k4x, k4l = rhs((x + h * k3x, ll), t + h)
        x = x + h / 6 * (k1x + 2 * k2x + 2 * k3x + k4x)
        ll = ll + h / 6 * (k1l + 2 * k2l + 2 * k3l + k4l)
        return (x, ll), None

    (latent, delta_ll), _ = lax.scan(step, (x, jnp.zeros((B,), x.dtype)), ts)
    ll_prior = jnp.sum(
        jax.scipy.stats.norm.logpdf(latent, scale=sigma_max).reshape(B, -1),
        axis=1)
    return ll_prior + delta_ll, {"fevals": 4 * steps}


# Dormand-Prince 5(4) tableau (the reference's torchdiffeq dopri5,
# sampling.py:296)
_DP_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DP_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DP_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DP_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
          187 / 2100, 1 / 40)


def log_likelihood_adaptive(denoise: Callable, x, sigma_min, sigma_max, key,
                            atol: float = 1e-4, rtol: float = 1e-4,
                            max_steps: int = 1000):
    """Adaptive-step ODE log-likelihood with dopri5 error control
    (ref: k_diffusion/sampling.py:279-299, torchdiffeq odeint method='dopri5'
    with the same atol/rtol semantics).

    Like the reference, integrates the probability-flow ODE in sigma from
    sigma_min to sigma_max with a single fixed Rademacher Hutchinson probe.
    The adaptive loop is a lax.while_loop (one XLA program): embedded 5(4)
    error estimate, standard accept/step-size controller
    (h *= clip(0.9 * err^(-1/5), 0.2, 10)), FSAL reuse of the last stage.

    Returns (ll [B], info dict with 'fevals' and 'steps' — fevals is exact,
    counted in-loop, unlike the fixed-step variant's static count).
    """
    B = x.shape[0]
    k_v, _ = jax.random.split(key)
    v = jax.random.rademacher(k_v, x.shape, dtype=x.dtype)
    t0, t1 = float(sigma_min), float(sigma_max)

    def f(sigma, y):
        xx, _ = y
        def d_fn(z):
            return to_d(z, sigma, denoise(z, sigma, None))
        d, vjp_fn = jax.vjp(d_fn, xx)
        grad = vjp_fn(v)[0]
        d_ll = jnp.sum((v * grad).reshape(B, -1), axis=1)
        return (d, d_ll)

    def axpy(y, ks, coeffs, h):
        # y + h * sum(c_i k_i) over the (x, ll) pytree
        def comb(yl, *kls):
            acc = yl
            for c, kl in zip(coeffs, kls):
                if c != 0.0:
                    acc = acc + h * c * kl
            return acc
        return jax.tree.map(comb, y, *ks)

    def err_norm(y_old, y_new, y_err):
        total, n = jnp.zeros(()), 0
        for e, a, b in zip(jax.tree.leaves(y_err), jax.tree.leaves(y_old),
                           jax.tree.leaves(y_new)):
            scale = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))
            total = total + jnp.sum((e / scale) ** 2)
            n += e.size
        return jnp.sqrt(total / n)

    y0 = (x, jnp.zeros((B,), x.dtype))
    f0 = f(jnp.asarray(t0), y0)
    h0 = (t1 - t0) / 100.0

    def cond(state):
        t, y, f_prev, h, fevals, steps = state
        return (t < t1) & (steps < max_steps)

    def body(state):
        t, y, f_prev, h, fevals, steps = state
        h = jnp.minimum(h, t1 - t)
        ks = [f_prev]  # FSAL: stage 1 = last stage of the accepted step
        for i in range(1, 7):
            yi = axpy(y, ks, _DP_A[i], h)
            ks.append(f(t + _DP_C[i] * h, yi))
        y5 = axpy(y, ks, _DP_B5, h)
        err = jax.tree.map(
            lambda *kls: h * sum((b5 - b4) * kl for b5, b4, kl
                                 in zip(_DP_B5, _DP_B4, kls)), *ks)
        norm = err_norm(y, y5, err)
        accept = norm <= 1.0
        factor = jnp.clip(0.9 * jnp.where(norm > 0, norm, 1e-10) ** -0.2,
                          0.2, 10.0)
        t_new = jnp.where(accept, t + h, t)
        y_new = jax.tree.map(lambda a, b: jnp.where(accept, b, a), y, y5)
        f_new = jax.tree.map(lambda a, b: jnp.where(accept, b, a),
                             f_prev, ks[6])
        return (t_new, y_new, f_new, h * factor, fevals + 6, steps + 1)

    state = (jnp.asarray(t0, x.dtype), y0, f0, jnp.asarray(h0, x.dtype),
             jnp.asarray(1), jnp.asarray(0))
    t, y, _, _, fevals, steps = lax.while_loop(cond, body, state)
    latent, delta_ll = y
    ll_prior = jnp.sum(
        jax.scipy.stats.norm.logpdf(latent, scale=sigma_max).reshape(B, -1),
        axis=1)
    return ll_prior + delta_ll, {"fevals": fevals, "steps": steps}


class PIDStepSizeController:
    """PID controller for adaptive step sizing (ref: k_diffusion/sampling.py:302-328).
    Host-side (controls the outer Python loop of `sample_dpm_adaptive`)."""

    def __init__(self, h, pcoeff, icoeff, dcoeff, order=1, accept_safety=0.81, eps=1e-8):
        self.h = h
        self.b1 = (pcoeff + icoeff + dcoeff) / order
        self.b2 = -(pcoeff + 2 * dcoeff) / order
        self.b3 = dcoeff / order
        self.accept_safety = accept_safety
        self.eps = eps
        self.errs = []

    def limiter(self, x):
        return 1 + math.atan(x - 1)

    def propose_step(self, error):
        inv_error = 1 / (float(error) + self.eps)
        if not self.errs:
            self.errs = [inv_error, inv_error, inv_error]
        self.errs[0] = inv_error
        factor = self.errs[0] ** self.b1 * self.errs[1] ** self.b2 * self.errs[2] ** self.b3
        factor = self.limiter(factor)
        accept = factor >= self.accept_safety
        if accept:
            self.errs[2] = self.errs[1]
            self.errs[1] = self.errs[0]
        self.h *= factor
        return accept


def sample_dpm_adaptive(denoise: Callable, x, sigma_min, sigma_max, key, order=3,
                        rtol=0.05, atol=0.0078, h_init=0.05, pcoeff=0.0, icoeff=1.0,
                        dcoeff=0.0, accept_safety=0.81, eta=0.0, s_noise=1.0,
                        return_info=False):
    """DPM-Solver-12/23 adaptive (ref: k_diffusion/sampling.py:425-503).

    The accept/reject control flow is inherently data-dependent, so the outer
    loop runs on host; the paired low/high-order step is one jitted program.
    """
    if sigma_min <= 0 or sigma_max <= 0:
        raise ValueError("sigma_min and sigma_max must both be nonzero")
    if order not in {2, 3}:
        raise ValueError("order should be 2 or 3")

    @jax.jit
    def paired_step(x, s, t_, k):
        if order == 2:
            x_low, eps = _dpm_solver_1_step(denoise, x, s, t_, k)
            x_high, _ = _dpm_solver_2_step(denoise, x, s, t_, k, eps=eps)
        else:
            x_low, eps = _dpm_solver_2_step(denoise, x, s, t_, k, r1=1 / 3)
            x_high, _ = _dpm_solver_3_step(denoise, x, s, t_, k, eps=eps)
        return x_low, x_high

    t_start, t_end = -math.log(sigma_max), -math.log(sigma_min)
    s = t_start
    x_prev = x
    pid = PIDStepSizeController(abs(h_init), pcoeff, icoeff, dcoeff,
                                1.5 if eta else order, accept_safety)
    info = {"steps": 0, "nfe": 0, "n_accept": 0, "n_reject": 0}

    while s < t_end - 1e-5:
        key, k_step, k_noise = _split3(key)
        t = min(t_end, s + pid.h)
        if eta:
            sd, su = get_ancestral_step(math.exp(-s), math.exp(-t), eta)
            t_ = min(t_end, float(-jnp.log(sd)))
            su = float(jnp.sqrt(jnp.clip(math.exp(-t) ** 2 - math.exp(-t_) ** 2, 0)))
        else:
            t_, su = t, 0.0
        x_low, x_high = paired_step(x, s, t_, k_step)
        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_low), jnp.abs(x_prev)))
        error = float(jnp.linalg.norm((x_low - x_high) / delta) / x.size ** 0.5)
        accept = pid.propose_step(error)
        if accept:
            x_prev = x_low
            x = x_high + su * s_noise * jax.random.normal(k_noise, x.shape, x.dtype)
            s = t
            info["n_accept"] += 1
        else:
            info["n_reject"] += 1
        info["nfe"] += order
        info["steps"] += 1

    if return_info:
        return x, info
    return x
