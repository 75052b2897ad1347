"""Deterministic Brownian-motion noise sampling for SDE samplers.

TPU-native replacement for the reference's torchsde-backed
`BatchedBrownianTree` / `BrownianTreeNoiseSampler`
(ref: k_diffusion/sampling.py:65-114): a virtual Brownian path W(t) defined by
recursive dyadic bisection (Levy bridge construction) with counter-based
randomness (`jax.random.fold_in`), so that W(t) is a deterministic pure
function of (key, t) — queryable in any order, consistent across step counts,
and fully traceable under jit/scan (fixed-depth descent, no data-dependent
control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _w_of_t(key, u, t_span, depth: int, shape, dtype):
    """W at relative position u in [0,1] over an interval of length t_span.

    Bisection: W(1) ~ N(0, t_span). Then recursively, the midpoint of a
    bracketing interval [a, b] with endpoint values (wa, wb) is
    (wa+wb)/2 + N(0, (b-a)/4); descend `depth` levels toward u and linearly
    bridge the remainder (error variance <= t_span * 2^-depth).
    """
    w_right = jax.random.normal(jax.random.fold_in(key, 0), shape, dtype) * jnp.sqrt(t_span)
    a = jnp.zeros((), dtype)
    b = jnp.ones((), dtype)
    wa = jnp.zeros(shape, dtype)
    wb = w_right

    def body(i, carry):
        a, b, wa, wb, path = carry
        mid = (a + b) / 2
        half = (b - a) / 2
        # Unique integer id of this dyadic node: level bits accumulated in `path`.
        go_right = (u >= mid)
        node_key = jax.random.fold_in(key, path + 1)
        wm = (wa + wb) / 2 + jax.random.normal(node_key, shape, dtype) * jnp.sqrt(
            half * t_span / 2)
        a = jnp.where(go_right, mid, a)
        b = jnp.where(go_right, b, mid)
        wa = jnp.where(go_right, wm, wa)
        wb = jnp.where(go_right, wb, wm)
        path = path * 2 + go_right.astype(jnp.int32) + 1
        return a, b, wa, wb, path

    a, b, wa, wb, _ = jax.lax.fori_loop(
        0, depth, body, (a, b, wa, wb, jnp.zeros((), jnp.int32)))
    # Linear bridge interpolation of the residual sub-interval.
    frac = jnp.where(b > a, (u - a) / (b - a), 0.0)
    return wa + (wb - wa) * frac


class BrownianTreeNoiseSampler:
    """Drop-in equivalent of the reference noise sampler
    (ref: k_diffusion/sampling.py:92-114): `__call__(sigma, sigma_next)`
    returns unit-variance noise `(W(t1) - W(t0)) / sqrt(|t1 - t0|)` where the
    underlying W is consistent for nested/overlapping queries.
    """

    def __init__(self, shape, sigma_min, sigma_max, key, dtype=jnp.float32,
                 transform=lambda s: s, depth: int = 24):
        self.shape = tuple(shape)
        self.dtype = dtype
        self.transform = transform
        self.key = key
        self.depth = depth
        t0 = float(transform(sigma_min))
        t1 = float(transform(sigma_max))
        self.t_lo, self.t_hi = (t0, t1) if t0 < t1 else (t1, t0)

    def _w(self, t):
        u = (t - self.t_lo) / (self.t_hi - self.t_lo)
        u = jnp.clip(jnp.asarray(u, self.dtype), 0.0, 1.0)
        return _w_of_t(self.key, u, jnp.asarray(self.t_hi - self.t_lo, self.dtype),
                       self.depth, self.shape, self.dtype)

    def __call__(self, sigma, sigma_next):
        t0 = self.transform(jnp.asarray(sigma, self.dtype))
        t1 = self.transform(jnp.asarray(sigma_next, self.dtype))
        w0, w1 = self._w(t0), self._w(t1)
        return (w1 - w0) / jnp.sqrt(jnp.abs(t1 - t0))
