"""Orthonormal transforms: DCT and multi-level Haar DWT (TPU-native).

Equivalent of `condition/utils.py:50-139` — but where the reference round-trips
through CPU scipy/pywt on every call (condition/utils.py:92-103, 116-139),
these run entirely on-device as XLA programs: the DCT via
`jax.scipy.fft.dctn` and the Haar DWT as butterfly adds/subtracts with
quadrant packing (pure reshapes + adds — bandwidth-bound, fully fused).

Conventions:
- Images are NHWC [B, H, W, C].
- `dct`/`idct` transform over every axis EXCEPT axis 0 (the batch axis).
  The reference's scipy `dctn(x)` with axes=None (condition/utils.py:94)
  transforms all axes, but it only ever runs under a batch==1 assertion
  where the batch-axis DCT is the identity; excluding axis 0 keeps exact
  parity there while making batch>1 per-image correct (ADVICE r1: the
  all-axes version silently coupled images through the basis). Inputs must
  therefore carry the batch axis — pass [1, H, W, C], not [H, W].
- `dwt` packs coefficients in the standard quadrant layout of
  pywt.coeffs_to_array (approximation top-left, finest details in the outer
  quadrants), applied over (H, W) per channel, Haar filters
  (lo = (e + o)/sqrt2, hi = (e - o)/sqrt2). Verified EXACT (layout and
  per-coefficient signs, atol 1e-12 at 256px level 3) against a dense-matrix
  oracle of pywt's wavedec2 + coeffs_to_array convention — see
  tests/test_dwt_pywt_layout.py — so converted `logvar_ot` heads trained
  against pywt (e.g. ffhq_dwt.ckpt) map 1:1 onto this basis.

All transforms are exactly orthonormal: W W^T = I, so inverse == transpose
(which the reference exploits via LinearFunction backward = transpose,
condition/utils.py:31-43; here jax.vjp gives that for free since the ops are
native linear jnp code).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional, Tuple

import jax.numpy as jnp
from jax.scipy import fft as jfft

_SQRT2 = math.sqrt(2.0)


# ---------------------------------------------------------------------------
# DCT (type II, orthonormal) over all axes
# ---------------------------------------------------------------------------

def dct(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal DCT-II over every non-batch axis
    (ref: condition/utils.py:88-96).

    The reference's scipy `dctn(x)` transforms *all* axes, but is only ever
    called under a batch==1 assertion (sample_condition_openai.py:110), where
    the batch-axis DCT is the identity. This repo lifts the batch=1
    restriction, so axis 0 is excluded to keep images independent: for B=1
    the result is bit-identical to the reference; for B>1 it is the per-image
    transform the math intends.
    """
    for axis in range(1, x.ndim):
        if x.shape[axis] > 1:
            x = jfft.dct(x, type=2, norm="ortho", axis=axis)
    return x


def idct(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal inverse DCT (= transpose) (ref: condition/utils.py:98-103).
    Axis 0 (batch) excluded — see `dct`."""
    for axis in range(1, x.ndim):
        if x.shape[axis] > 1:
            x = jfft.idct(x, type=2, norm="ortho", axis=axis)
    return x


# ---------------------------------------------------------------------------
# Multi-level orthonormal Haar DWT with quadrant packing
# ---------------------------------------------------------------------------

def _haar_fwd_axis(x: jnp.ndarray, axis: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n = x.shape[axis]
    assert n % 2 == 0, f"Haar DWT needs even size on axis {axis}, got {n}"
    even = jnp.take(x, jnp.arange(0, n, 2), axis=axis)
    odd = jnp.take(x, jnp.arange(1, n, 2), axis=axis)
    return (even + odd) / _SQRT2, (even - odd) / _SQRT2


def _haar_inv_axis(lo: jnp.ndarray, hi: jnp.ndarray, axis: int) -> jnp.ndarray:
    even = (lo + hi) / _SQRT2
    odd = (lo - hi) / _SQRT2
    stacked = jnp.stack([even, odd], axis=axis + 1)
    shape = list(lo.shape)
    shape[axis] = shape[axis] * 2
    return stacked.reshape(shape)


def dwt2(x: jnp.ndarray, level: int = 3, h_axis: int = -3, w_axis: int = -2) -> jnp.ndarray:
    """Multi-level 2-D Haar DWT with quadrant packing
    (ref: condition/utils.py:106-139 DiscreteWaveletTransform, pywt wavedec2 +
    coeffs_to_array layout).

    Default axes are NHWC spatial. Output has the same shape as the input:
    level-k approximation in the top-left (H/2^k, W/2^k) block, details in
    the sibling quadrants.
    """
    h_axis = h_axis % x.ndim
    w_axis = w_axis % x.ndim
    out = x
    H, W = x.shape[h_axis], x.shape[w_axis]
    for lv in range(level):
        hs, ws = H >> lv, W >> lv
        # slice the current approximation block
        idx = [slice(None)] * x.ndim
        idx[h_axis], idx[w_axis] = slice(0, hs), slice(0, ws)
        block = out[tuple(idx)]
        lo_h, hi_h = _haar_fwd_axis(block, h_axis)
        ll, lh = _haar_fwd_axis(lo_h, w_axis)
        hl, hh = _haar_fwd_axis(hi_h, w_axis)
        top = jnp.concatenate([ll, lh], axis=w_axis)
        bot = jnp.concatenate([hl, hh], axis=w_axis)
        out = out.at[tuple(idx)].set(jnp.concatenate([top, bot], axis=h_axis))
    return out


def idwt2(x: jnp.ndarray, level: int = 3, h_axis: int = -3, w_axis: int = -2) -> jnp.ndarray:
    """Inverse (= transpose) of dwt2."""
    h_axis = h_axis % x.ndim
    w_axis = w_axis % x.ndim
    out = x
    H, W = x.shape[h_axis], x.shape[w_axis]
    for lv in range(level - 1, -1, -1):
        hs, ws = H >> lv, W >> lv
        idx = [slice(None)] * x.ndim
        idx[h_axis], idx[w_axis] = slice(0, hs), slice(0, ws)
        block = out[tuple(idx)]
        half_h = [slice(None)] * x.ndim
        # split quadrants
        def quad(hsl, wsl):
            q = [slice(None)] * x.ndim
            q[h_axis], q[w_axis] = hsl, wsl
            return block[tuple(q)]
        ll = quad(slice(0, hs // 2), slice(0, ws // 2))
        lh = quad(slice(0, hs // 2), slice(ws // 2, ws))
        hl = quad(slice(hs // 2, hs), slice(0, ws // 2))
        hh = quad(slice(hs // 2, hs), slice(ws // 2, ws))
        lo_h = _haar_inv_axis(ll, lh, w_axis)
        hi_h = _haar_inv_axis(hl, hh, w_axis)
        rec = _haar_inv_axis(lo_h, hi_h, h_axis)
        out = out.at[tuple(idx)].set(rec)
    return out


# ---------------------------------------------------------------------------
# OrthoTransform dispatch (ref: condition/utils.py:50-77)
# ---------------------------------------------------------------------------

class OrthoTransform:
    """Callable pair (forward, inverse) for an orthonormal transform type.

    ortho_tf_type in {None, 'dct', 'dwt'}; None is the identity
    (ref: condition/utils.py:50-67). Instances are stateless and safe to
    close over in jitted functions.
    """

    def __init__(self, ortho_tf_type: Optional[str] = None, level: int = 3,
                 use_pallas: bool = False):
        self.ortho_tf_type = ortho_tf_type
        self.level = level
        if ortho_tf_type is None:
            self._fwd = lambda x: x
            self._inv = lambda x: x
        elif ortho_tf_type == "dct":
            self._fwd = dct
            self._inv = idct
        elif ortho_tf_type == "dwt":
            if use_pallas:
                from .pallas_dwt import dwt2_pallas, idwt2_pallas
                self._fwd = lambda x: dwt2_pallas(x, level)
                self._inv = lambda x: idwt2_pallas(x, level)
            else:
                self._fwd = partial(dwt2, level=level)
                self._inv = partial(idwt2, level=level)
        else:
            raise ValueError(f"unknown ortho_tf_type: {ortho_tf_type}")

    def __call__(self, x):
        return self._fwd(x)

    def inv(self, x):
        return self._inv(x)


def ot_covariance(ortho_tf: OrthoTransform, variance: jnp.ndarray) -> Callable:
    """C = W diag(v) W^T as a matvec closure
    (ref: condition/utils.py:146-163 LazyOTCovariance). Symmetric, so
    transpose == forward."""
    def matvec(x):
        return ortho_tf.inv(ortho_tf(x) * variance)
    return matvec
