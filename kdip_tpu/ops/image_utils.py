"""MATLAB-compatible image utilities (DiffPIR aux surface).

TPU-native re-design of the reference's image grab-bag
(ref: condition/diffpir_utils/utils_image.py):

- MATLAB ``imresize`` (ref: utils_image.py:621-774) is rebuilt as *dense
  per-axis resize matrices* applied as two matmuls, the same MXU-friendly
  strategy as ops/resize.py — instead of the reference's per-row Python
  gather loops. The symmetric boundary extension is folded into the matrix
  columns, so there is no padding step and the op batches/vmaps freely.
- MATLAB PSNR/SSIM (ref: utils_image.py:546-610) run in float64 on host
  (they are *reported* metrics; exactness beats speed — see the
  fp32-cancellation note in metrics.py).
- dtype/color conversions (ref: utils_image.py:182-533) are pure numpy.

Nothing here sits on the sampling hot path.
"""

from __future__ import annotations

import math

import numpy as np

import jax.numpy as jnp

__all__ = [
    "uint2single", "single2uint", "uint162single", "single2uint16",
    "rgb2ycbcr", "ycbcr2rgb", "bgr2ycbcr", "modcrop", "shave",
    "imresize_matrix", "imresize", "imresize_np",
    "calculate_psnr", "calculate_ssim",
    "imread_uint", "imsave",
]


# ---------------------------------------------------------------------------
# dtype conversions (ref: utils_image.py:182-205)
# ---------------------------------------------------------------------------

def uint2single(img: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [0,1] (ref: utils_image.py:182-184)."""
    return np.float32(img / 255.0)


def single2uint(img: np.ndarray) -> np.ndarray:
    """float [0,1] -> uint8, clipped+rounded (ref: utils_image.py:187-189)."""
    return np.uint8((np.clip(img, 0.0, 1.0) * 255.0).round())


def uint162single(img: np.ndarray) -> np.ndarray:
    """uint16 [0,65535] -> float32 [0,1] (ref: utils_image.py:192-194)."""
    return np.float32(img / 65535.0)


def single2uint16(img: np.ndarray) -> np.ndarray:
    """float [0,1] -> uint16 (ref: utils_image.py:197-199)."""
    return np.uint16((np.clip(img, 0.0, 1.0) * 65535.0).round())


# ---------------------------------------------------------------------------
# color space (MATLAB-coefficient YCbCr; ref: utils_image.py:429-495)
# ---------------------------------------------------------------------------

_RGB2YCBCR = np.array([[65.481, -37.797, 112.0],
                       [128.553, -74.203, -93.786],
                       [24.966, 112.0, -18.214]], dtype=np.float64)
_YCBCR_OFFSET = np.array([16.0, 128.0, 128.0], dtype=np.float64)


def _ycbcr_common(img: np.ndarray, mat: np.ndarray, offset) -> np.ndarray:
    in_type = img.dtype
    x = img.astype(np.float64)
    if in_type != np.uint8:
        x = x * 255.0
    out = x @ mat + offset
    if in_type == np.uint8:
        out = out.round()
    else:
        out = out / 255.0
    return out.astype(in_type)


def rgb2ycbcr(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    """MATLAB rgb2ycbcr; uint8 [0,255] or float [0,1]
    (ref: utils_image.py:429-450)."""
    if only_y:
        return _ycbcr_common(img, _RGB2YCBCR[:, :1] / 255.0,
                             np.array([16.0]))[..., 0]
    return _ycbcr_common(img, _RGB2YCBCR / 255.0, _YCBCR_OFFSET)


def bgr2ycbcr(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    """BGR variant (ref: utils_image.py:474-495)."""
    mat = _RGB2YCBCR[::-1]
    if only_y:
        return _ycbcr_common(img, mat[:, :1] / 255.0, np.array([16.0]))[..., 0]
    return _ycbcr_common(img, mat / 255.0, _YCBCR_OFFSET)


def ycbcr2rgb(img: np.ndarray) -> np.ndarray:
    """MATLAB ycbcr2rgb (ref: utils_image.py:453-471)."""
    in_type = img.dtype
    x = img.astype(np.float64)
    if in_type != np.uint8:
        x = x * 255.0
    mat = np.array([[0.00456621, 0.00456621, 0.00456621],
                    [0.0, -0.00153632, 0.00791071],
                    [0.00625893, -0.00318811, 0.0]], dtype=np.float64)
    out = x @ mat * 255.0 + np.array([-222.921, 135.576, -276.836])
    out = np.clip(out, 0.0, 255.0)
    if in_type == np.uint8:
        out = out.round()
    else:
        out = out / 255.0
    return out.astype(in_type)


def modcrop(img: np.ndarray, scale: int) -> np.ndarray:
    """Crop H,W to multiples of scale (ref: utils_image.py:498-511)."""
    h, w = img.shape[:2]
    return img[: h - h % scale, : w - w % scale]


def shave(img: np.ndarray, border: int = 0) -> np.ndarray:
    """Trim a border (ref: utils_image.py:514-519)."""
    if border == 0:
        return img
    return img[border:-border, border:-border]


# ---------------------------------------------------------------------------
# MATLAB imresize, bicubic + antialiasing (ref: utils_image.py:621-774)
# ---------------------------------------------------------------------------

def _matlab_cubic(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    return ((1.5 * ax3 - 2.5 * ax2 + 1.0) * (ax <= 1.0)
            + (-0.5 * ax3 + 2.5 * ax2 - 4.0 * ax + 2.0)
            * ((ax > 1.0) & (ax <= 2.0)))


def imresize_matrix(in_length: int, scale: float,
                    antialiasing: bool = True) -> np.ndarray:
    """Dense (out_length, in_length) MATLAB-bicubic resize matrix.

    Matches the reference's calculate_weights_indices + symmetric boundary
    copy (ref: utils_image.py:629-754) exactly, but expressed as one matrix
    so the resize itself is a single (MXU) matmul per axis. Out-of-range
    taps are reflected (single symmetric reflection) into valid columns.
    """
    out_length = int(math.ceil(in_length * scale))
    kernel_width = 4.0
    if scale < 1 and antialiasing:
        kernel_width = kernel_width / scale

    x = np.arange(1, out_length + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1.0 - 1.0 / scale)
    left = np.floor(u - kernel_width / 2.0)
    p = int(math.ceil(kernel_width)) + 2
    indices = left[:, None] + np.arange(p, dtype=np.float64)[None, :]
    dist = u[:, None] - indices
    if scale < 1 and antialiasing:
        weights = scale * _matlab_cubic(dist * scale)
    else:
        weights = _matlab_cubic(dist)
    weights = weights / weights.sum(axis=1, keepdims=True)

    # Drop an all-zero first/last column (ref: utils_image.py:668-675).
    zero_cols = (weights == 0).sum(axis=0)
    col0, col1 = 0, p
    if not math.isclose(zero_cols[0], 0, rel_tol=1e-6):
        col0 += 1
    if not math.isclose(zero_cols[-1], 0, rel_tol=1e-6):
        col1 -= 1
    weights = weights[:, col0:col1]
    indices = indices[:, col0:col1].astype(np.int64) - 1  # 0-based

    # Fold the symmetric boundary extension into the matrix columns.
    # Iterate the reflection: for very strong downscales the kernel can be
    # wider than 2*in_length, so one reflection may land out of range again
    # (numpy's negative indexing would then silently hit a wrong column).
    mat = np.zeros((out_length, in_length), dtype=np.float64)
    idx = indices.copy()
    for _ in range(max(1, int(math.ceil(kernel_width / (2 * in_length))) + 1)):
        idx = np.where(idx < 0, -idx - 1, idx)
        idx = np.where(idx >= in_length, 2 * in_length - 1 - idx, idx)
    assert (idx >= 0).all() and (idx < in_length).all(), \
        f"boundary reflection failed for scale={scale}, in_length={in_length}"
    rows = np.repeat(np.arange(out_length), idx.shape[1])
    np.add.at(mat, (rows, idx.ravel()), weights.ravel())
    return mat


def imresize(img, scale: float, antialiasing: bool = True):
    """MATLAB imresize (bicubic), channel-last; HW or HWC, float [0,1]
    (ref: utils_image.py:687-754 — torch CHW variant; 760+ — numpy HWC).

    Accepts numpy or jnp arrays; the resize is two dense matmuls so it
    jits/vmaps and runs on the MXU for on-device use.
    """
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    in_h, in_w = x.shape[0], x.shape[1]
    mh = imresize_matrix(in_h, scale, antialiasing)
    mw = imresize_matrix(in_w, scale, antialiasing)
    if isinstance(x, np.ndarray):
        out = np.einsum("oh,hwc->owc", mh, x.astype(np.float64))
        out = np.einsum("pw,owc->opc", mw, out)
    else:
        dt = x.dtype
        out = jnp.einsum("oh,hwc->owc", jnp.asarray(mh, dt), x)
        out = jnp.einsum("pw,owc->opc", jnp.asarray(mw, dt), out)
    return out[..., 0] if squeeze else out


def imresize_np(img: np.ndarray, scale: float,
                antialiasing: bool = True) -> np.ndarray:
    """Alias matching the reference's numpy entry point
    (ref: utils_image.py:760)."""
    return np.asarray(imresize(np.asarray(img), scale, antialiasing))


# ---------------------------------------------------------------------------
# MATLAB PSNR / SSIM (ref: utils_image.py:546-610)
# ---------------------------------------------------------------------------

def calculate_psnr(img1: np.ndarray, img2: np.ndarray,
                   border: int = 0) -> float:
    """PSNR on [0,255] images with optional border crop
    (ref: utils_image.py:546-559)."""
    if img1.shape != img2.shape:
        raise ValueError("Input images must have the same dimensions.")
    a = shave(img1, border).astype(np.float64)
    b = shave(img2, border).astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * math.log10(255.0 / math.sqrt(mse))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    half = (size - 1) / 2.0
    g = np.exp(-((np.arange(size) - half) ** 2) / (2.0 * sigma * sigma))
    g = g / g.sum()
    return np.outer(g, g)


def _filter_valid(x: np.ndarray, window: np.ndarray) -> np.ndarray:
    """'same' correlation cropped to the valid region — equivalent to the
    reference's cv2.filter2D(...)[5:-5, 5:-5] (ref: utils_image.py:599-606),
    done as a separable float64 correlation."""
    k = window.shape[0]
    out_h = x.shape[0] - k + 1
    out_w = x.shape[1] - k + 1
    # Direct accumulation (k is 11; this is a reported metric, not hot).
    out = np.zeros((out_h, out_w), dtype=np.float64)
    for i in range(k):
        for j in range(k):
            out += window[i, j] * x[i:i + out_h, j:j + out_w]
    return out


def _ssim_single(img1: np.ndarray, img2: np.ndarray) -> float:
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    a = img1.astype(np.float64)
    b = img2.astype(np.float64)
    w = _gaussian_window(11, 1.5)
    mu1 = _filter_valid(a, w)
    mu2 = _filter_valid(b, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = _filter_valid(a * a, w) - mu1_sq
    s2 = _filter_valid(b * b, w) - mu2_sq
    s12 = _filter_valid(a * b, w) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return float(ssim_map.mean())


def calculate_ssim(img1: np.ndarray, img2: np.ndarray,
                   border: int = 0) -> float:
    """MATLAB-style SSIM on [0,255] images (ref: utils_image.py:565-610).

    NB the reference's color branch averages three calls of ssim(img1, img2)
    on the *full* array (utils_image.py:580-582) — each call already filters
    every channel, so the mean equals one whole-array evaluation; we compute
    that directly (per-channel valid-window stats, averaged)."""
    if img1.shape != img2.shape:
        raise ValueError("Input images must have the same dimensions.")
    a = shave(img1, border)
    b = shave(img2, border)
    if a.ndim == 2:
        return _ssim_single(a, b)
    if a.ndim == 3 and a.shape[2] == 1:
        return _ssim_single(a[..., 0], b[..., 0])
    if a.ndim == 3:
        return float(np.mean([_ssim_single(a[..., c], b[..., c])
                              for c in range(a.shape[2])]))
    raise ValueError("Wrong input image dimensions.")


# ---------------------------------------------------------------------------
# IO (ref: utils_image.py:146-179)
# ---------------------------------------------------------------------------

def imread_uint(path: str, n_channels: int = 3) -> np.ndarray:
    """Read an image as HxWxC uint8 (ref: utils_image.py:146-158; PIL
    instead of cv2 — cv2 is not a dependency of this framework)."""
    from PIL import Image
    with Image.open(path) as im:
        if n_channels == 1:
            arr = np.array(im.convert("L"))[:, :, None]
        else:
            arr = np.array(im.convert("RGB"))
    return arr


def imsave(img: np.ndarray, img_path: str) -> None:
    """Save HxWxC / HxW uint8 (ref: utils_image.py:161-166)."""
    from PIL import Image
    arr = np.squeeze(img)
    Image.fromarray(arr).save(img_path)
