"""autoI guidance: gradient of the exact Gaussian measurement log-likelihood.

The reference implements this (condition.py:89-90, 133-138, 77-81) by
autodiffing gpytorch's `MultivariateNormal.log_prob` with a matrix-free
`LazyLikelihoodCovariance` (condition.py:18-38) — internally CG solves plus
stochastic Lanczos for the logdet, all on CPU.

Here we compute the gradient in closed form (no logdet value needed — only
its derivative), fully on-device:

    L(x) = log N(y; mu(x), K(x)),   K = sigma_s^2 I + A W diag(v(x)) W^T A^T

    dL/dx = J_mu^T K^{-1} r  +  J_v^T g_v,        r = y - mu
    g_v_i = 0.5 [ (W^T A^T K^{-1} r)_i^2 - (W^T A^T K^{-1} A W)_{ii} ]

with K^{-1} applied by conjugate gradients and the diagonal of the trace term
estimated by Hutchinson probes (Rademacher z): diag(M) ~= E[z * M z].
Both J_mu^T and J_v^T come from one `jax.vjp` through the model.

A / A^T follow the reference's operator methods (note: for super-resolution
the reference pairs the exact bicubic forward with the FFT-kernel transpose,
condition.py:27-28 + measurements.py:103-119 — we mirror that).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def auto_type_I_guidance(uncond_pred: Callable, x0_var_fn: Callable, operator,
                         y: jnp.ndarray, cfg, params, x, sigma, key,
                         ortho_tf, v2: bool = False):
    """hat_x0 = x0_mean + sigma^2 * d log p(y|x) / dx
    (ref: condition.py:133-138). Returns (hat_x0, cg_rel_resid) where the
    residual is the worst |r|/|b| over the K^{-1} solves (the r-solve and
    every Hutchinson probe solve)."""
    from .guidance import _cg  # late import: avoids a module cycle
    A = operator.forward
    AT = operator.transpose
    sigma_s = jnp.clip(operator.sigma_s, min=0.001)

    def moments(xx):
        x0_mean, aux = uncond_pred(params, xx, sigma)
        if v2:
            x0_var, theta0_var = x0_var_fn(aux, sigma)
        else:
            x0_var = x0_var_fn(aux, sigma, None, xx.shape)
            theta0_var = x0_var
        svar = x0_var if cfg.ortho_tf_type is None else theta0_var
        return x0_mean, svar

    (x0_mean, svar), vjp_fn = jax.vjp(moments, x)
    v = lax.stop_gradient(svar)

    def cov_mv(u):  # W diag(v) W^T
        return ortho_tf.inv(v * ortho_tf(u))

    def K_mv(u):  # measurement-space covariance matvec (ref: condition.py:24-32)
        return sigma_s ** 2 * u + A(cov_mv(AT(u)))

    r = y - A(x0_mean)
    alpha, resid = _cg(K_mv, lax.stop_gradient(r), cfg)

    # quad-term contribution to dL/dv: (W^T A^T alpha)^2 / 2
    wta = ortho_tf(AT(alpha))
    quad_term = 0.5 * wta ** 2

    # trace term diag(W^T A^T K^{-1} A W) via Hutchinson probes
    def probe(i, carry):
        acc, worst = carry
        z = jax.random.rademacher(jax.random.fold_in(key, i), x.shape,
                                  dtype=x.dtype)
        Az = A(ortho_tf.inv(z))
        s, pr = _cg(K_mv, Az, cfg)
        return acc + z * ortho_tf(AT(s)), jnp.maximum(worst, pr)

    n_probes = cfg.num_probes
    diag_est, resid = lax.fori_loop(0, n_probes, probe,
                                    (jnp.zeros_like(x), resid))
    diag_est = diag_est / n_probes
    g_v = quad_term - 0.5 * diag_est

    # mean-term cotangent: J_mu^T K^{-1} r = (d A(x0_mean) / d x0_mean)^T alpha
    _, opvjp = jax.vjp(A, x0_mean)
    mean_ct = opvjp(alpha)[0]

    # broadcast-safe cotangent for svar (it may be scalar when above the
    # mle threshold path collapsed — reduce accordingly)
    if jnp.ndim(svar) == 0:
        var_ct = jnp.sum(g_v)
    else:
        var_ct = jnp.broadcast_to(g_v, jnp.shape(svar))

    likelihood_score = vjp_fn((mean_ct, var_ct))[0]
    return x0_mean + sigma ** 2 * likelihood_score, resid
