"""FFT-domain SISR/deblurring math (TPU-native, NHWC).

Equivalent of the reference's `condition/diffpir_utils/utils_sisr.py` —
PSF->OTF conversion, the precomputed FFT quadruple (FB, FBC, F2B, FBFy),
s-fold up/down-sampling, block `splits`, and DiffPIR's closed-form data
solution — rebuilt on `jnp.fft` over the spatial axes of channels-last
tensors so everything compiles into fused XLA FFT programs on TPU (no host
round-trips, static shapes).

Layout conventions: images are [B, H, W, C] real; OTFs are [H, W] (or
broadcastable [..., H, W, 1]) complex64 applied over axes (-3, -2).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

_SPATIAL = (-3, -2)  # H, W axes of NHWC


def fft2(x):
    """2-D FFT over the spatial axes of an NHWC tensor."""
    return jnp.fft.fftn(x, axes=_SPATIAL)


def ifft2(x):
    return jnp.fft.ifftn(x, axes=_SPATIAL)


def fft2c(x):
    """Centered orthonormal 2-D FFT over the spatial axes
    (ref: condition/dps_utils/fastmri_utils.py fft2c_new and
    dps_utils/img_utils.py:26 fft2_m)."""
    x = jnp.fft.ifftshift(x, axes=_SPATIAL)
    x = jnp.fft.fftn(x, axes=_SPATIAL, norm="ortho")
    return jnp.fft.fftshift(x, axes=_SPATIAL)


def ifft2c(x):
    """Inverse of fft2c."""
    x = jnp.fft.ifftshift(x, axes=_SPATIAL)
    x = jnp.fft.ifftn(x, axes=_SPATIAL, norm="ortho")
    return jnp.fft.fftshift(x, axes=_SPATIAL)


def psf_to_otf_np(psf, shape):
    """Host-side (numpy) psf_to_otf for operator construction.

    Operator spectra are precomputed once and then closed over by jitted
    programs; keeping them as numpy avoids a device->host transfer of
    complex64 at trace time (unsupported on some TPU transports).
    """
    import numpy as np
    psf = np.asarray(psf)
    h, w = psf.shape[-2:]
    H, W = shape
    otf = np.zeros(psf.shape[:-2] + (H, W), psf.dtype)
    otf[..., :h, :w] = psf
    otf = np.roll(otf, (-(h // 2), -(w // 2)), axis=(-2, -1))
    return np.fft.fftn(otf, axes=(-2, -1)).astype(np.complex64)


def psf_to_otf(psf: jnp.ndarray, shape) -> jnp.ndarray:
    """Point-spread function -> optical transfer function
    (ref: diffpir_utils/utils_sisr.py:22-41 `p2o`).

    psf: [h, w] real kernel; shape: (H, W) target size.
    Returns [H, W] complex64 OTF with the kernel centered at the origin
    (rolled by -h//2, -w//2 to remove off-centering).
    """
    h, w = psf.shape[-2:]
    H, W = shape
    otf = jnp.zeros(psf.shape[:-2] + (H, W), psf.dtype)
    otf = otf.at[..., :h, :w].set(psf)
    otf = jnp.roll(otf, (-(h // 2), -(w // 2)), axis=(-2, -1))
    return jnp.fft.fftn(otf, axes=(-2, -1))


def apply_otf(x: jnp.ndarray, otf: jnp.ndarray) -> jnp.ndarray:
    """Circular convolution y = real(ifft2(OTF * fft2(x))) on NHWC input.

    otf: [H, W] complex — broadcast across batch and channels.
    """
    return ifft2(otf[..., :, :, None] * fft2(x)).real


def splits(a: jnp.ndarray, sf: int) -> jnp.ndarray:
    """Splits [B, H, W, C] into the sf*sf aliasing blocks:
    returns [B, H/sf, W/sf, C, sf*sf] (ref: utils_sisr.py:9-19).

    Block ordering matches the reference (H-chunks stacked first, W-chunks
    concatenated after): last-dim index = w_chunk * sf + h_chunk.
    """
    B, H, W, C = a.shape
    b = a.reshape(B, sf, H // sf, sf, W // sf, C)
    b = b.transpose(0, 2, 4, 5, 3, 1)  # [B, H/sf, W/sf, C, sf_w, sf_h]
    return b.reshape(B, H // sf, W // sf, C, sf * sf)


def upsample(x: jnp.ndarray, sf: int = 3) -> jnp.ndarray:
    """s-fold zero-filling upsampler (ref: utils_sisr.py:44-52):
    out[..., i*sf, j*sf, :] = x[..., i, j, :], zeros elsewhere."""
    if sf == 1:
        return x
    pad_cfg = [(0, 0, 0), (0, sf - 1, sf - 1), (0, sf - 1, sf - 1), (0, 0, 0)]
    # numpy scalar: a device-array pad value would be embedded as a jit
    # constant needing a device->host transfer (unsupported for complex64 on
    # some TPU transports)
    import numpy as np
    return lax.pad(x, np.zeros((), jnp.dtype(x.dtype)), pad_cfg)


def downsample(x: jnp.ndarray, sf: int = 3) -> jnp.ndarray:
    """s-fold downsampler keeping the upper-left pixel of each sf x sf patch
    (ref: utils_sisr.py:55-61)."""
    if sf == 1:
        return x
    return x[..., ::sf, ::sf, :]


def pre_calculate(y: jnp.ndarray, psf: jnp.ndarray, sf: int):
    """Precomputes the FFT quadruple reused across sampler iterations
    (ref: utils_sisr.py:79-96).

    y: [B, h, w, C] low-res (or same-res for sf=1) measurement;
    psf: [kh, kw] kernel. Returns (FB, FBC, F2B, FBFy) where FB/FBC/F2B are
    [H, W] = [h*sf, w*sf] and FBFy is [B, H, W, C] complex.
    """
    h, w = y.shape[-3:-1]
    FB = psf_to_otf(psf, (h * sf, w * sf))
    FBC = jnp.conj(FB)
    F2B = jnp.abs(FB) ** 2
    STy = upsample(y, sf=sf)
    FBFy = FBC[..., :, :, None] * fft2(STy)
    return FB, FBC, F2B, FBFy


def data_solution(x: jnp.ndarray, FB, FBC, F2B, FBFy, alpha, sf: int) -> jnp.ndarray:
    """DiffPIR closed-form proximal data solution (ref: utils_sisr.py:65-76):
    argmin_z ||y - SHz||^2 + alpha ||z - x||^2 via FFT diagonalization."""
    alpha = jnp.clip(jnp.asarray(alpha, x.dtype), min=1e-2)
    FR = FBFy + fft2(alpha * x)
    x1 = FB[..., :, :, None] * FR
    FBR = jnp.mean(splits(x1, sf), axis=-1)
    invW = jnp.mean(splits(F2B[..., :, :, None] * jnp.ones_like(x, FB.dtype), sf)
                    if F2B.ndim != 2 else
                    splits(jnp.broadcast_to(F2B[..., None], x.shape).astype(FB.dtype), sf),
                    axis=-1)
    invWBR = FBR / (invW + alpha)
    FCBinvWBR = FBC[..., :, :, None] * jnp.tile(invWBR, (1, sf, sf, 1))
    FX = (FR - FCBinvWBR) / alpha
    return ifft2(FX).real


def classical_degradation(x: jnp.ndarray, k: np.ndarray,
                          sf: int = 3) -> jnp.ndarray:
    """Classical SR degradation: circular (wrap) blur + s-fold subsampling
    (ref: utils_sisr.py:99-113, which uses scipy.ndimage.convolve(mode=
    'wrap')). Wrap convolution IS circular convolution, so on TPU we do it
    in the Fourier domain via the existing psf->otf path instead of a host
    scipy call. x: [H, W, C]; k: [h, w]."""
    # psf_to_otf's corner placement + roll by -(size//2) reproduces
    # ndimage.convolve's kernel centering exactly, for both odd and even
    # kernel sizes (validated against scipy in tests).
    otf = psf_to_otf(jnp.asarray(np.asarray(k)), x.shape[:2])
    blurred = jnp.real(jnp.fft.ifft2(
        jnp.fft.fft2(x, axes=(0, 1)) * otf[..., None], axes=(0, 1)))
    return blurred[::sf, ::sf, ...]


def shift_pixel(x: np.ndarray, sf: int, upper_left: bool = True) -> np.ndarray:
    """Half-pixel-grid shift used to align bicubic SR kernels
    (ref: utils_sisr.py:117-143). The reference uses scipy's removed
    interp2d(kind='linear'); this is the same bilinear resample on the
    shifted grid, done with direct axis-wise linear interpolation."""
    x = np.array(x, dtype=np.float64)
    h, w = x.shape[:2]
    shift = (sf - 1) * 0.5
    xv = np.arange(w, dtype=np.float64)
    yv = np.arange(h, dtype=np.float64)
    x1 = np.clip(xv + (shift if upper_left else -shift), 0, w - 1)
    y1 = np.clip(yv + (shift if upper_left else -shift), 0, h - 1)

    def interp_axis(arr, coords, axis):
        i0 = np.floor(coords).astype(int)
        i1 = np.minimum(i0 + 1, arr.shape[axis] - 1)
        t = coords - i0
        a0 = np.take(arr, i0, axis=axis)
        a1 = np.take(arr, i1, axis=axis)
        tshape = [1] * arr.ndim
        tshape[axis] = len(coords)
        return a0 + (a1 - a0) * t.reshape(tshape)

    out = interp_axis(interp_axis(x, y1, 0), x1, 1)
    return out
