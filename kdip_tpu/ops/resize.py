"""Exact antialiased resampling as separable matrix products (TPU-native).

Equivalent of the reference's ResizeRight-style `Resizer`
(ref: condition/dps_utils/resizer.py:8-197) — the exact bicubic downsampler
used as the super-resolution forward operator A. Instead of gather +
weighted-sum (resizer.py:55-74), the per-dimension contributions are
materialized once (host-side numpy, mirroring resizer.py:104-167 exactly:
antialiased stretched kernels, center-preserving coordinate mapping, mirror
boundary) into dense [out, in] matrices, and resizing becomes two einsum
contractions — dense matmuls that XLA maps straight onto the MXU and that
are trivially linear/differentiable (adjoint = transposed matrices).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def cubic(x):
    """Keys cubic interpolation kernel (ref: resizer.py:173-178)."""
    absx = np.abs(x)
    absx2 = absx ** 2
    absx3 = absx ** 3
    return ((1.5 * absx3 - 2.5 * absx2 + 1) * (absx <= 1)
            + (-0.5 * absx3 + 2.5 * absx2 - 4 * absx + 2) * ((1 < absx) & (absx <= 2)))


def lanczos2(x):
    eps = np.finfo(np.float32).eps
    return (((np.sin(math.pi * x) * np.sin(math.pi * x / 2) + eps)
             / ((math.pi ** 2 * x ** 2 / 2) + eps)) * (np.abs(x) < 2))


def lanczos3(x):
    eps = np.finfo(np.float32).eps
    return (((np.sin(math.pi * x) * np.sin(math.pi * x / 3) + eps)
             / ((math.pi ** 2 * x ** 2 / 3) + eps)) * (np.abs(x) < 3))


def box(x):
    return ((-0.5 <= x) & (x < 0.5)) * 1.0


def linear(x):
    return (x + 1) * ((-1 <= x) & (x < 0)) + (1 - x) * ((0 <= x) & (x <= 1))


_METHODS = {
    "cubic": (cubic, 4.0),
    "lanczos2": (lanczos2, 4.0),
    "lanczos3": (lanczos3, 6.0),
    "box": (box, 1.0),
    "linear": (linear, 2.0),
    None: (cubic, 4.0),
}


def resize_matrix(in_length: int, out_length: int, scale: float,
                  kernel: Optional[str] = None, antialiasing: bool = True) -> np.ndarray:
    """Dense [out_length, in_length] resampling matrix for one dimension.

    Reproduces `Resizer.contributions` (ref: resizer.py:104-167): antialiased
    kernel stretching for downscaling, center-preserving subpixel coordinate
    mapping, weight normalization, and mirror boundary handling.
    """
    method, kernel_width = _METHODS[kernel]
    antialiasing = antialiasing and (scale < 1)
    fixed_kernel = (lambda arg: scale * method(scale * arg)) if antialiasing else method
    kernel_width = kernel_width / scale if antialiasing else kernel_width

    out_coordinates = np.arange(1, out_length + 1)
    shifted = out_coordinates - (out_length - in_length * scale) / 2
    match_coordinates = shifted / scale + 0.5 * (1 - 1 / scale)
    left_boundary = np.floor(match_coordinates - kernel_width / 2)
    expanded_kernel_width = int(np.ceil(kernel_width)) + 2
    field_of_view = (left_boundary[:, None] + np.arange(expanded_kernel_width) - 1
                     ).astype(np.int64)
    weights = fixed_kernel(match_coordinates[:, None] - field_of_view - 1)
    sum_weights = weights.sum(axis=1)
    sum_weights[sum_weights == 0] = 1.0
    weights = weights / sum_weights[:, None]
    # mirror boundary (ref: resizer.py:158-159)
    mirror = np.concatenate([np.arange(in_length), np.arange(in_length - 1, -1, -1)])
    field_of_view = mirror[np.mod(field_of_view, mirror.shape[0])]

    M = np.zeros((out_length, in_length), dtype=np.float64)
    np.add.at(M, (np.repeat(np.arange(out_length), field_of_view.shape[1]),
                  field_of_view.ravel()), weights.ravel())
    return M.astype(np.float32)


def make_resizer(in_hw: Tuple[int, int], scale_factor: float, kernel: Optional[str] = None,
                 antialiasing: bool = True):
    """Returns (resize_fn, (Mh, Mw)): resize_fn maps [B, H, W, C] ->
    [B, H', W', C] via two MXU matmuls; matrices are also returned so callers
    can build the exact adjoint (M^T)."""
    H, W = in_hw
    out_h = int(np.ceil(H * scale_factor))
    out_w = int(np.ceil(W * scale_factor))
    Mh = jnp.asarray(resize_matrix(H, out_h, scale_factor, kernel, antialiasing))
    Mw = jnp.asarray(resize_matrix(W, out_w, scale_factor, kernel, antialiasing))

    def resize(x):
        x = jnp.einsum("oh,bhwc->bowc", Mh, x)
        return jnp.einsum("ow,bhwc->bhoc", Mw, x)

    return resize, (Mh, Mw)


def resize(x: jnp.ndarray, scale_factor: float, kernel: Optional[str] = None,
           antialiasing: bool = True) -> jnp.ndarray:
    """One-shot exact resize of an NHWC batch."""
    fn, _ = make_resizer(x.shape[1:3], scale_factor, kernel, antialiasing)
    return fn(x)
