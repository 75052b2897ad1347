"""Inpainting initialization helpers (DiffPIR aux surface).

TPU-native port of condition/diffpir_utils/utils_inpaint.py:

- ``get_rho_sigma`` (ref: utils_inpaint.py:15-25): the plug-and-play
  HQS rho/sigma annealing schedule.
- ``shepard_initialize`` (ref: utils_inpaint.py:28-63): inverse-distance
  (Shepard) interpolation of masked pixels. The reference is a quadruple
  Python loop over pixels x window; here it is a fixed set of shifted
  adds (one per window offset) — fully vectorized, jit-able, and exact to
  the reference including its asymmetric window (the reference's
  ``range(i+lower, i+upper)`` excludes the top end, so the support is
  [-wing, wing-1] and additionally drops the last in-bounds row/column
  near the bottom/right edges; we reproduce that with per-shift validity
  masks).

Mask generation itself lives in operators.generate_mask
(ref: utils_inpaint.py:67-135 mask_generator).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax.numpy as jnp

__all__ = ["get_rho_sigma", "shepard_initialize"]


def get_rho_sigma(sigma: float = 2.55 / 255, iter_num: int = 15,
                  model_sigma2: float = 2.55) -> Tuple[np.ndarray, np.ndarray]:
    """HQS annealing schedule: log-spaced model sigmas from 49.0 down to
    `model_sigma2` (on the [0,255] scale) and the matching penalty weights
    rho = sigma^2 / sigma_k^2 / 3 (ref: utils_inpaint.py:15-25)."""
    model_sigma1 = 49.0
    model_sigmas = np.logspace(np.log10(model_sigma1),
                               np.log10(model_sigma2), iter_num)
    sigmas = model_sigmas / 255.0
    rhos = (sigma ** 2) / (sigmas ** 2) / 3.0
    return rhos, sigmas


def shepard_initialize(image: jnp.ndarray, mask: jnp.ndarray,
                       window: int = 5, p: int = 2) -> jnp.ndarray:
    """Fill masked-out pixels by inverse-p-power-distance interpolation of
    measured neighbors in a `window`-sized neighborhood
    (ref: utils_inpaint.py:28-63).

    image: [H, W] or [H, W, C]; mask: [H, W] with 1 = measured, 0 = missing.
    Pixels with no measured neighbor in the window stay 0 (as in the
    reference, where `interpolated_value` remains 0).
    """
    image = jnp.asarray(image)
    squeeze = image.ndim == 2
    x = image[..., None] if squeeze else image
    h, w = x.shape[0], x.shape[1]
    m = jnp.asarray(mask, dtype=x.dtype).reshape(h, w)
    wing = window // 2

    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    num = jnp.zeros_like(x)
    den = jnp.zeros((h, w, 1), dtype=x.dtype)
    mx = x * m[..., None]
    for di in range(-wing, wing):
        # reference: neighborhood_i in [i - min(wing,i), i + min(wing,h-i-1))
        # => shift di is valid at row i iff 0 <= i+di < h and di < h-i-1
        row_ok = (rows + di >= 0) & (rows + di < h) & (di < h - 1 - rows)
        src_i = jnp.clip(rows + di, 0, h - 1)
        for dj in range(-wing, wing):
            if di == 0 and dj == 0:
                continue  # the center is the pixel being filled (mask 0)
            weight = 1.0 / float(di ** p + dj ** p)
            col_ok = (cols + dj >= 0) & (cols + dj < w) & (dj < w - 1 - cols)
            ok = (row_ok & col_ok).astype(x.dtype)
            src_j = jnp.clip(cols + dj, 0, w - 1)
            shifted_mx = mx[src_i, src_j]          # [H, W, C]
            shifted_m = m[src_i, src_j]            # [H, W]
            num = num + weight * shifted_mx * ok[..., None]
            den = den + weight * (shifted_m * ok)[..., None]
    filled = num / jnp.where(den > 0, den, 1.0)
    out = jnp.where(m[..., None] > 0, x, filled)
    return out[..., 0] if squeeze else out
