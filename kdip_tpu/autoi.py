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


def _lanczos_tridiag(matvec_flat: Callable, q0: jnp.ndarray, k: int):
    """k-step Lanczos tridiagonalization of a symmetric PSD operator given
    by `matvec_flat` on flat vectors, started at the unit vector q0.

    Returns (alphas[k], betas[k-1]) — the diagonal and subdiagonal of the
    Krylov tridiagonal T. Uses full reorthogonalization (twice) against the
    stored basis, which is what keeps the Ritz values usable for quadrature
    at k ~ 20-30; the basis is (k, d) so this is diagnostic-scale memory.
    Early breakdown (beta ~ 0) yields zero vectors for the remaining steps,
    producing decoupled zero Ritz pairs whose quadrature weight is 0 — the
    consumer clamps eigenvalues before log so those contribute nothing.
    """
    d = q0.shape[0]
    Q = jnp.zeros((k, d), q0.dtype).at[0].set(q0)

    def body(carry, i):
        Q, q_prev, beta_prev = carry
        q = Q[i]
        w = matvec_flat(q) - beta_prev * q_prev
        a = jnp.vdot(w, q)
        w = w - a * q
        # full reorthogonalization; rows >= i are zero so masking is free
        w = w - Q.T @ (Q @ w)
        w = w - Q.T @ (Q @ w)
        b = jnp.linalg.norm(w)
        q_next = jnp.where(b > 1e-8 * jnp.abs(a) + 1e-30,
                           w / jnp.maximum(b, 1e-30), jnp.zeros_like(w))
        Q = lax.cond(i + 1 < k,
                     lambda Q: Q.at[i + 1].set(q_next), lambda Q: Q, Q)
        return (Q, q, b), (a, b)

    (_, _, _), (alphas, betas) = lax.scan(
        body, (Q, jnp.zeros_like(q0), jnp.zeros((), q0.dtype)),
        jnp.arange(k))
    return alphas, betas[:-1]


def slq_logdet(matvec: Callable, example: jnp.ndarray, key,
               num_probes: int = 8, lanczos_iters: int = 25) -> jnp.ndarray:
    """Stochastic Lanczos quadrature estimate of logdet(K) for the symmetric
    positive-definite operator `matvec` acting on arrays shaped like
    `example` — the estimator gpytorch runs inside
    `MultivariateNormal.log_prob` on a lazy covariance
    (ref: condition/condition.py:77-81 via gpytorch's
    inv_quad_logdet). Fully on-device: lax.scan Lanczos + a (k, k) eigh.

        logdet(K) ~= (d / m) * sum_i sum_j tau_ij^2 * log(lambda_ij)

    with tau the first-row eigenvector components of each probe's
    tridiagonal T_i and Rademacher probes z_i (||z_i||^2 = d).
    """
    d = example.size
    shape = example.shape
    dtype = example.dtype

    def mv_flat(u):
        return matvec(u.reshape(shape)).reshape(-1)

    def one_probe(i):
        z = jax.random.rademacher(jax.random.fold_in(key, i), (d,),
                                  dtype=dtype)
        q0 = z / jnp.sqrt(jnp.asarray(d, dtype))
        alphas, betas = _lanczos_tridiag(mv_flat, q0, lanczos_iters)
        T = (jnp.diag(alphas) + jnp.diag(betas, 1) + jnp.diag(betas, -1))
        lam, U = jnp.linalg.eigh(T)
        # clamp: K >= sigma_s^2 I > 0, so true Ritz values are positive;
        # zeros only appear from early-breakdown padding, whose weight is 0
        lam = jnp.maximum(lam, jnp.finfo(lam.dtype).tiny)
        tau2 = U[0, :] ** 2
        return jnp.sum(tau2 * jnp.log(lam))

    def body(i, acc):
        return acc + one_probe(i)

    total = lax.fori_loop(0, num_probes, body, jnp.zeros((), dtype))
    return d * total / num_probes


def measurement_loglikelihood(operator, ortho_tf, y: jnp.ndarray,
                              x0_mean: jnp.ndarray, svar, cfg, key,
                              lanczos_iters: int = 25):
    """Scalar log N(y; A x0_mean, K), K = sigma_s^2 I + A W diag(svar) W^T A^T
    — the VALUE the reference's `ConditionDenoiser.loglikelihood` returns
    (condition.py:77-81, gpytorch MultivariateNormal.log_prob with the lazy
    covariance of condition.py:18-38, evaluated by CG + stochastic Lanczos).

    `svar` is the solver-basis variance (x0_var, or theta0_var when an
    ortho transform is configured), broadcastable against image tensors.
    Returns (ll, cg_rel_resid): CG solves the quadratic term (its relative
    residual is surfaced like every other solve), SLQ estimates the logdet.
    Guidance itself never consumes this value — the reference, like us,
    uses only its gradient (closed form in `auto_type_I_guidance`) — so
    this is the matching diagnostic surface.
    """
    A = operator.forward
    AT = operator.transpose
    sigma_s = jnp.clip(operator.sigma_s, min=0.001)
    v = lax.stop_gradient(svar)

    def K_mv(u):
        return sigma_s ** 2 * u + A(ortho_tf.inv(v * ortho_tf(AT(u))))

    r = y - A(x0_mean)
    from .guidance import _cg  # late import: avoids a module cycle
    alpha, resid = _cg(K_mv, lax.stop_gradient(r), cfg)
    quad = jnp.vdot(r.reshape(-1), alpha.reshape(-1))

    logdet = slq_logdet(K_mv, y, key, num_probes=cfg.num_probes,
                        lanczos_iters=lanczos_iters)
    d = y.size
    ll = -0.5 * (quad + logdet + d * jnp.log(2 * jnp.pi))
    return ll, resid


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
