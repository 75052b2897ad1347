"""Gradient noise scale (GNS) measurement.

Equivalent of `k_diffusion/gns.py`: estimates the critical batch size from
small-batch vs large-batch gradient norms (McCandlish et al. 2018). The
reference captures per-rank gradients with a DDP comm hook (gns.py:5-34);
on a dp mesh the per-device gradient is the "small batch" gradient and the
all-reduced mean is the "large batch" gradient — both are produced inside
the jitted train step via `shard_map`, no hooks needed.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P  # noqa: F401 (caller API)


def grad_norm_stats(local_grads, axis: str = "dp"):
    """Returns (sq_norm_small, sq_norm_big): the mean per-device gradient
    squared norm and the squared norm of the cross-device mean gradient —
    the two statistics `GradientNoiseScale.update` consumes
    (ref: k_diffusion/gns.py:37-78, which captures them with a DDP comm hook).

    Must be called INSIDE `shard_map` over the dp mesh axis, with
    `local_grads` the gradients of this device's microbatch (before any
    psum). The cross-device reductions become ICI collectives.
    """
    flat = jnp.concatenate([g.reshape(-1) for g in jax.tree.leaves(local_grads)])
    sq_local = jnp.sum(flat ** 2)
    mean_grad = jax.lax.pmean(flat, axis)
    sq_small = jax.lax.pmean(sq_local, axis)
    sq_big = jnp.sum(mean_grad ** 2)
    return sq_small, sq_big


class GradientNoiseScale:
    """EMA-based GNS estimator (ref: k_diffusion/gns.py:37-99).

    update(sq_norm_small_batch, sq_norm_large_batch, n_small, n_large)
    maintains debiased EMAs of the gradient-magnitude and noise estimates;
    get_gns() = noise / scale."""

    def __init__(self, beta: float = 0.9998, eps: float = 1e-8):
        self.beta = beta
        self.eps = eps
        self.ema_sq_norm = 0.0
        self.ema_var = 0.0
        self.beta_cumprod = 1.0
        self.gradient_noise_scale = float("nan")

    def update(self, sq_norm_small_batch: float, sq_norm_large_batch: float,
               n_small_batch: int, n_large_batch: int) -> float:
        est_sq_norm = (n_large_batch * sq_norm_large_batch
                       - n_small_batch * sq_norm_small_batch) / (
            n_large_batch - n_small_batch)
        est_var = (sq_norm_small_batch - sq_norm_large_batch) / (
            1 / n_small_batch - 1 / n_large_batch)
        self.ema_sq_norm = self.beta * self.ema_sq_norm + (1 - self.beta) * est_sq_norm
        self.ema_var = self.beta * self.ema_var + (1 - self.beta) * est_var
        self.beta_cumprod *= self.beta
        self.gradient_noise_scale = max(self.ema_var, self.eps) / max(
            self.ema_sq_norm, self.eps)
        return self.gradient_noise_scale

    def get_gns(self) -> float:
        return self.gradient_noise_scale

    def get_stats(self) -> Tuple[float, float]:
        """Debiased EMA estimates (ref: k_diffusion/gns.py:93-99)."""
        return (self.ema_sq_norm / (1 - self.beta_cumprod),
                self.ema_var / (1 - self.beta_cumprod))
