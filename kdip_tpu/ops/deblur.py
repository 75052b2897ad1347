"""Boundary-artifact reduction + OTF/PSF helpers for classic deconvolution.

TPU-native port of the reference's remaining deblur math
(ref: condition/diffpir_utils/utils_deblur.py):

- ``wrap_boundary_liu`` (ref: utils_deblur.py:300-379) pads an image to a
  target FFT size with a smooth wrap-around border (Liu & Jia, ICIP 2008) so
  circular deconvolution has no seam. The inner Poisson solve
  (``solve_min_laplacian``, ref: utils_deblur.py:382-438) diagonalizes the
  Laplacian with a type-I DST; we implement DST-I via an odd-extended rFFT
  (jnp) instead of scipy.fftpack, so the whole pad is jit-able and runs
  on-device — the reference round-trips through scipy on host.
- ``opt_fft_size`` (ref: utils_deblur.py:250-297): 2/3/5/7-smooth (times
  11/13) FFT-friendly length lookup.
- ``psf2otf`` / ``otf2psf`` / ``zero_pad`` (ref: utils_deblur.py:123-242):
  numpy, precompute-time.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np

import jax.numpy as jnp

__all__ = [
    "zero_pad", "psf2otf", "otf2psf", "opt_fft_size",
    "dst1", "idst1", "solve_min_laplacian", "wrap_boundary",
    "wrap_boundary_liu",
]


# ---------------------------------------------------------------------------
# PSF <-> OTF (numpy; precompute-time. The jnp hot-path variant is
# ops/fft.psf_to_otf.)
# ---------------------------------------------------------------------------

def zero_pad(image: np.ndarray, shape, position: str = "corner") -> np.ndarray:
    """Zero-extend a 2D array to `shape` (ref: utils_deblur.py:203-242)."""
    shape = np.asarray(shape, dtype=int)
    imshape = np.asarray(image.shape, dtype=int)
    if np.array_equal(imshape, shape):
        return image
    if np.any(shape <= 0):
        raise ValueError("zero_pad: null or negative shape")
    dshape = shape - imshape
    if np.any(dshape < 0):
        raise ValueError("zero_pad: target smaller than source")
    if position == "center":
        if np.any(dshape % 2 != 0):
            raise ValueError("zero_pad: shape parity mismatch for center")
        off = dshape // 2
    else:
        off = np.zeros_like(dshape)
    out = np.zeros(tuple(shape), dtype=image.dtype)
    out[off[0]:off[0] + imshape[0], off[1]:off[1] + imshape[1]] = image
    return out


def psf2otf(psf: np.ndarray, shape=None) -> np.ndarray:
    """PSF -> OTF with center-to-origin circular shift
    (ref: utils_deblur.py:154-200)."""
    if shape is None:
        shape = psf.shape
    if np.all(psf == 0):
        return np.zeros(tuple(np.asarray(shape, dtype=int)))
    if psf.ndim == 1:
        psf = psf[None, :]
    inshape = psf.shape
    padded = zero_pad(psf, shape, position="corner")
    for axis, axis_size in enumerate(inshape):
        padded = np.roll(padded, -(axis_size // 2), axis=axis)
    otf = np.fft.fft2(padded, axes=(0, 1))
    n_ops = np.sum(padded.size * np.log2(padded.shape))
    return np.real_if_close(otf, tol=n_ops)


def otf2psf(otf: np.ndarray, outsize=None) -> np.ndarray:
    """OTF -> PSF, optional center crop (ref: utils_deblur.py:123-150)."""
    insize = np.array(otf.shape)
    psf = np.fft.ifftn(otf, axes=(0, 1))
    for axis, axis_size in enumerate(insize):
        psf = np.roll(psf, int(np.floor(axis_size / 2)), axis=axis)
    if outsize is not None:
        outsize = np.asarray(outsize, dtype=int)
        pad = (insize - outsize) / 2
        if np.any(pad < 0):
            raise ValueError("otf2psf: outsize must be <= otf size")
        start = np.floor(pad).astype(int)
        end = (insize - np.ceil(pad)).astype(int)
        psf = psf[start[0]:end[0], start[1]:end[1]]
    n_ops = np.sum(otf.size * np.log2(otf.shape))
    return np.real_if_close(psf, tol=n_ops)


@functools.lru_cache(maxsize=1)
def _opt_fft_size_lut(lut_size: int = 2048) -> np.ndarray:
    """Smallest 2^a·3^b·5^c·7^d·{1,11,13} length >= n, for n <= lut_size
    (ref: utils_deblur.py:250-297)."""
    smooth = np.zeros(lut_size + 1, dtype=np.int64)
    e2 = 1
    while e2 <= lut_size:
        e3 = e2
        while e3 <= lut_size:
            e5 = e3
            while e5 <= lut_size:
                e7 = e5
                while e7 <= lut_size:
                    smooth[e7] = e7
                    if e7 * 11 <= lut_size:
                        smooth[e7 * 11] = e7 * 11
                    if e7 * 13 <= lut_size:
                        smooth[e7 * 13] = e7 * 13
                    e7 *= 7
                e5 *= 5
            e3 *= 3
        e2 *= 2
    # forward-fill: entry n = smallest smooth number >= n
    best = 0
    for n in range(lut_size, 0, -1):
        if smooth[n]:
            best = smooth[n]
        smooth[n] = best
    return smooth


def opt_fft_size(n: Sequence[int]) -> np.ndarray:
    """Vector version of the reference's LUT lookup
    (ref: utils_deblur.py:290-297); -1 above the LUT range."""
    lut = _opt_fft_size_lut()
    n = np.asarray(n, dtype=np.int64)
    out = np.where(n <= len(lut) - 1, lut[np.minimum(n, len(lut) - 1)], -1)
    return out.astype(np.float64)


# ---------------------------------------------------------------------------
# DST-I via odd-extended FFT (jit-able; replaces scipy.fftpack.dst/idst)
# ---------------------------------------------------------------------------

def dst1(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Type-I discrete sine transform, scipy.fftpack.dst(type=1) convention:
    y_k = 2 * sum_j x_j sin(pi (j+1)(k+1) / (N+1)).

    Implemented as the imaginary part of a length-2(N+1) FFT of the odd
    extension [0, x, 0, -rev(x)] — pure XLA, no host round-trip."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    zeros = jnp.zeros(x.shape[:-1] + (1,), dtype=x.dtype)
    ext = jnp.concatenate([zeros, x, zeros, -x[..., ::-1]], axis=-1)
    spec = jnp.fft.rfft(ext, axis=-1)
    out = -spec.imag[..., 1:n + 1]
    return jnp.moveaxis(out, -1, axis)


def idst1(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Inverse of dst1 under scipy's normalization:
    idst(y, type=1) = dst(y, type=1) / (2 (N+1)) ... scaled so that
    idst1(dst1(x)) == x."""
    n = x.shape[axis]
    return dst1(x, axis=axis) / (2.0 * (n + 1))


def solve_min_laplacian(boundary: jnp.ndarray) -> jnp.ndarray:
    """Fill the interior of `boundary` (values on the 1-px frame) with the
    minimum-Laplacian (harmonic) completion, by diagonalizing the 5-point
    Laplacian with DST-I (ref: utils_deblur.py:382-438)."""
    boundary = jnp.asarray(boundary)
    h, w = boundary.shape
    frame = boundary.at[1:-1, 1:-1].set(0.0)
    # boundary contribution to the interior Laplacian
    f_bp = (-4.0 * frame[1:-1, 1:-1] + frame[1:-1, 2:] + frame[1:-1, :-2]
            + frame[:-2, 1:-1] + frame[2:, 1:-1])
    f2 = -f_bp  # rhs (f = 0)
    # 2-D DST-I, eigenvalue division, inverse
    tt = dst1(f2, axis=1) / 2.0
    f2sin = dst1(tt, axis=0) / 2.0
    x = jnp.arange(1, w - 1, dtype=boundary.dtype)
    y = jnp.arange(1, h - 1, dtype=boundary.dtype)
    denom = ((2.0 * jnp.cos(jnp.pi * x[None, :] / (w - 1)) - 2.0)
             + (2.0 * jnp.cos(jnp.pi * y[:, None] / (h - 1)) - 2.0))
    f3 = f2sin / denom
    tt = idst1(2.0 * f3, axis=0)
    img_tt = idst1(2.0 * tt, axis=1)
    return frame.at[1:-1, 1:-1].set(img_tt)


def wrap_boundary(img: jnp.ndarray, img_size) -> jnp.ndarray:
    """Pad one channel to `img_size` with a smooth wrap-around border
    (ref: utils_deblur.py:315-379, alpha=1 path)."""
    img = jnp.asarray(img)
    h, w = img.shape
    hw_ = int(img_size[0]) - h
    ww_ = int(img_size[1]) - w

    # vertical strip between bottom and (wrapped) top rows
    a_col = jnp.linspace(0.0, 1.0, hw_, dtype=img.dtype)
    r_a = jnp.zeros((2 + hw_, w), dtype=img.dtype)
    r_a = r_a.at[0, :].set(img[-1, :])
    r_a = r_a.at[-1, :].set(img[0, :])
    r_a = r_a.at[1:-1, 0].set((1 - a_col) * r_a[0, 0] + a_col * r_a[-1, 0])
    r_a = r_a.at[1:-1, -1].set((1 - a_col) * r_a[0, -1] + a_col * r_a[-1, -1])

    # horizontal strip between right and (wrapped) left columns
    a_row = jnp.linspace(0.0, 1.0, ww_, dtype=img.dtype)
    r_b = jnp.zeros((h, 2 + ww_), dtype=img.dtype)
    r_b = r_b.at[:, 0].set(img[:, -1])
    r_b = r_b.at[:, -1].set(img[:, 0])
    r_b = r_b.at[0, 1:-1].set((1 - a_row) * r_b[0, 0] + a_row * r_b[0, -1])
    r_b = r_b.at[-1, 1:-1].set((1 - a_row) * r_b[-1, 0] + a_row * r_b[-1, -1])

    r_a = solve_min_laplacian(r_a)
    r_b = solve_min_laplacian(r_b)

    # corner block stitched from the two strips
    r_c = jnp.zeros((2 + hw_, 2 + ww_), dtype=img.dtype)
    r_c = r_c.at[0, :].set(r_b[-1, :])
    r_c = r_c.at[-1, :].set(r_b[0, :])
    r_c = r_c.at[:, 0].set(r_a[:, -1])
    r_c = r_c.at[:, -1].set(r_a[:, 0])
    r_c = solve_min_laplacian(r_c)

    a_mid = r_a[:-2, :]    # (hw_, W): rows 0..hw_-1  (ref drops last 2)
    b_mid = r_b[:, 1:-1]   # (H, ww_)
    c_mid = r_c[1:-1, 1:-1]
    top = jnp.concatenate([img, b_mid], axis=1)
    bottom = jnp.concatenate([a_mid, c_mid], axis=1)
    return jnp.concatenate([top, bottom], axis=0)


def wrap_boundary_liu(img: jnp.ndarray, img_size) -> jnp.ndarray:
    """Channel-wise wrap_boundary (ref: utils_deblur.py:300-312)."""
    img = jnp.asarray(img)
    if img.ndim == 2:
        return wrap_boundary(img, img_size)
    chans = [wrap_boundary(img[:, :, c], img_size)
             for c in range(img.shape[2])]
    return jnp.stack(chans, axis=2)
