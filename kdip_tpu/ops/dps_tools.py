"""DPS auxiliary tooling: bbox/mask generation, patch extraction, image
normalization, and the fastMRI centered-FFT helper surface.

Equivalent of `condition/dps_utils/tools.py` (bbox/mask/patch utilities from
the generative-inpainting lineage, ref: tools.py:56-228, 10-52) and
`condition/dps_utils/fastmri_utils.py` (complex-as-channel centered FFTs,
ref: fastmri_utils.py:16-200) — TPU-native: explicit JAX PRNG keys instead of
global numpy RNG, NHWC masks, jnp.fft for the shifts.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Image normalization helpers (ref: tools.py:10-52, 237-252)
# ---------------------------------------------------------------------------


def clear(x) -> np.ndarray:
    """Device array -> [0,1] numpy image (ref: tools.py:249-252)."""
    return normalize_np(np.asarray(x).squeeze())


def clear_color(x) -> np.ndarray:
    """Device NHWC/CHW array -> normalized HWC numpy (ref: tools.py:244-247)."""
    x = np.asarray(x).squeeze()
    if x.ndim == 3 and x.shape[0] in (1, 3):  # CHW -> HWC
        x = np.transpose(x, (1, 2, 0))
    return normalize_np(x)


def normalize_np(img: np.ndarray) -> np.ndarray:
    """Min-max normalize to [0, 1] (ref: tools.py:20-25)."""
    img = img - img.min()
    rng = img.max()
    return img / rng if rng > 0 else img


# ---------------------------------------------------------------------------
# bbox / mask generation (ref: tools.py:106-228)
# ---------------------------------------------------------------------------


def random_bbox(key, image_shape: Tuple[int, int], mask_shape: Tuple[int, int],
                margin: Tuple[int, int] = (0, 0), batch_size: int = 1,
                mask_batch_same: bool = True) -> np.ndarray:
    """Random (top, left, height, width) boxes (ref: tools.py:106-133).

    Returns int array [B, 4]."""
    ih, iw = image_shape
    h, w = mask_shape
    mh, mw = margin
    maxt, maxl = ih - mh - h, iw - mw - w
    n = 1 if mask_batch_same else batch_size
    kt, kl = jax.random.split(key)
    ts = jax.random.randint(kt, (n,), mh, maxt)
    ls = jax.random.randint(kl, (n,), mw, maxl)
    boxes = np.stack([np.asarray(ts), np.asarray(ls),
                      np.full(n, h), np.full(n, w)], axis=1)
    if mask_batch_same:
        boxes = np.repeat(boxes, batch_size, axis=0)
    return boxes


def bbox2mask(key, bboxes: np.ndarray, height: int, width: int,
              max_delta_h: int = 0, max_delta_w: int = 0) -> jnp.ndarray:
    """Boxes -> [B, H, W, 1] {0,1} masks with random inward jitter
    (ref: tools.py:144-152). 1 inside the box."""
    bboxes = np.asarray(bboxes)
    masks = []
    for i, (t, l, h, w) in enumerate(bboxes):
        ki = jax.random.fold_in(key, i)
        kh, kw = jax.random.split(ki)
        dh = int(jax.random.randint(kh, (), 0, max_delta_h // 2 + 1))
        dw = int(jax.random.randint(kw, (), 0, max_delta_w // 2 + 1))
        m = np.zeros((height, width, 1), np.float32)
        m[t + dh:t + h - dh, l + dw:l + w - dw] = 1.0
        masks.append(m)
    return jnp.asarray(np.stack(masks))


def local_patch(x: jnp.ndarray, bbox_list) -> jnp.ndarray:
    """Crops each image's box (ref: tools.py:165-171). x: [B, H, W, C];
    all boxes must share (h, w)."""
    patches = [x[i, t:t + h, l:l + w] for i, (t, l, h, w)
               in enumerate(np.asarray(bbox_list))]
    return jnp.stack(patches)


def mask_image(key, x: jnp.ndarray, bboxes, image_shape: Tuple[int, int],
               max_delta_shape: Tuple[int, int] = (0, 0),
               mask_type: str = "hole", mosaic_unit_size: int = 8):
    """Applies a bbox mask: 'hole' zeroes the box, 'mosaic' pixelates it
    (ref: tools.py:174-192). x: [B, H, W, C]. Returns (result, mask)."""
    height, width = image_shape
    mask = bbox2mask(key, bboxes, height, width, *max_delta_shape)
    if mask_type == "hole":
        return x * (1.0 - mask), mask
    if mask_type == "mosaic":
        B, H, W, C = x.shape
        small = jax.image.resize(
            x, (B, H // mosaic_unit_size, W // mosaic_unit_size, C), "nearest")
        up = jax.image.resize(small, (B, height, width, C), "nearest")
        return up * mask + x * (1.0 - mask), mask
    raise NotImplementedError("unrecognized mask type")


def spatial_discounting_mask(mask_shape: Tuple[int, int],
                             gamma: float = 0.9,
                             discounted: bool = True) -> jnp.ndarray:
    """Distance-discounted loss weighting inside a mask, Yu et al. 2018
    (ref: tools.py:195-226). Returns [1, h, w, 1]."""
    h, w = mask_shape
    if not discounted:
        return jnp.ones((1, h, w, 1), jnp.float32)
    i = np.arange(h)[:, None]
    j = np.arange(w)[None, :]
    vals = np.maximum(gamma ** np.minimum(i, h - i),
                      gamma ** np.minimum(j, w - j))
    return jnp.asarray(vals[None, :, :, None].astype(np.float32))


def same_padding_amounts(in_size: int, ksize: int, stride: int,
                         rate: int) -> Tuple[int, int]:
    out = (in_size + stride - 1) // stride
    eff_k = (ksize - 1) * rate + 1
    pad = max(0, (out - 1) * stride + eff_k - in_size)
    return pad // 2, pad - pad // 2


def extract_image_patches(images: jnp.ndarray, ksizes, strides, rates,
                          padding: str = "same") -> jnp.ndarray:
    """TF-style patch extraction (ref: tools.py:56-103, which uses unfold).

    images: [B, H, W, C]. Returns [B, nH, nW, ksize_h * ksize_w * C] with
    the patch dimension ordered (kh, kw, c) — the NHWC-native analogue of
    the reference's torch.nn.Unfold output.
    """
    kh, kw = ksizes
    sh, sw = strides
    rh, rw = rates
    if padding == "same":
        ph = same_padding_amounts(images.shape[1], kh, sh, rh)
        pw = same_padding_amounts(images.shape[2], kw, sw, rw)
    elif padding == "valid":
        ph = pw = (0, 0)
    else:
        raise NotImplementedError(f"padding {padding}")
    patches = jax.lax.conv_general_dilated_patches(
        images, (kh, kw), (sh, sw), (ph, pw), rhs_dilation=(rh, rw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # conv_general_dilated_patches emits (c, kh, kw) channel order; reorder
    # to (kh, kw, c)
    B, nH, nW, _ = patches.shape
    C = images.shape[-1]
    patches = patches.reshape(B, nH, nW, C, kh * kw)
    patches = jnp.moveaxis(patches, 3, 4).reshape(B, nH, nW, kh * kw * C)
    return patches


# ---------------------------------------------------------------------------
# fastMRI centered FFTs, complex-as-last-dim-2 representation
# (ref: fastmri_utils.py:16-200)
# ---------------------------------------------------------------------------


def _to_complex(x: jnp.ndarray) -> jnp.ndarray:
    assert x.shape[-1] == 2, "expects (..., 2) real/imag layout"
    return jax.lax.complex(x[..., 0], x[..., 1])


def _from_complex(z: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([z.real, z.imag], axis=-1)


def fft2c(data: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
    """Centered 2D FFT over the two dims before the complex dim
    (ref: fastmri_utils.py:67-90 fft2c_new)."""
    z = jnp.fft.ifftshift(_to_complex(data), axes=(-2, -1))
    z = jnp.fft.fft2(z, norm=norm)
    return _from_complex(jnp.fft.fftshift(z, axes=(-2, -1)))


def ifft2c(data: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
    """(ref: fastmri_utils.py:92-118 ifft2c_new)"""
    z = jnp.fft.ifftshift(_to_complex(data), axes=(-2, -1))
    z = jnp.fft.ifft2(z, norm=norm)
    return _from_complex(jnp.fft.fftshift(z, axes=(-2, -1)))


def fftshift(x: jnp.ndarray, axes=None) -> jnp.ndarray:
    """(ref: fastmri_utils.py:163-183)"""
    return jnp.fft.fftshift(x, axes=axes)


def ifftshift(x: jnp.ndarray, axes=None) -> jnp.ndarray:
    """(ref: fastmri_utils.py:186-200)"""
    return jnp.fft.ifftshift(x, axes=axes)


def roll(x: jnp.ndarray, shift, axes) -> jnp.ndarray:
    """(ref: fastmri_utils.py:140-160)"""
    return jnp.roll(x, shift, axes)


# ---------------------------------------------------------------------------
# Patch fold/unfold, thresholding, and misc DPS helpers
# (ref: dps_utils/img_utils.py:67-155, 119-141, 230-243, 304-362)
# ---------------------------------------------------------------------------


def center_crop(img: np.ndarray, new_width: Optional[int] = None,
                new_height: Optional[int] = None) -> np.ndarray:
    """Center-crop an HW(C) array (ref: img_utils.py:119-141)."""
    height, width = img.shape[:2]
    new_width = min(width, height) if new_width is None else new_width
    new_height = min(width, height) if new_height is None else new_height
    left = int(np.ceil((width - new_width) / 2))
    right = width - int(np.floor((width - new_width) / 2))
    top = int(np.ceil((height - new_height) / 2))
    bottom = height - int(np.floor((height - new_height) / 2))
    return img[top:bottom, left:right, ...]


def unfold_patches(x: jnp.ndarray, crop_size: int = 128,
                   stride: int = 64) -> jnp.ndarray:
    """[B, H, W, C] -> [B, n*n, crop, crop, C] sliding patches — the
    Unfolder (ref: img_utils.py:104-116) as static-grid slices, NHWC. Each
    patch is a contiguous slice so XLA lowers this to cheap dynamic-slices
    instead of a gather."""
    h = x.shape[1]
    dim = (h - crop_size) // stride + 1
    rows = []
    for i in range(dim):
        for j in range(dim):
            rows.append(x[:, i * stride:i * stride + crop_size,
                          j * stride:j * stride + crop_size, :])
    return jnp.stack(rows, axis=1)


def fold_patches(patches: jnp.ndarray, img_size: int = 256,
                 stride: int = 64) -> jnp.ndarray:
    """Inverse of unfold_patches: overlap-*sum* (torch nn.Fold semantics,
    the Folder of ref: img_utils.py:143-154). [B, n*n, k, k, C] -> NHWC."""
    b, n, k, _, c = patches.shape
    dim = int(round(np.sqrt(n)))
    out = jnp.zeros((b, img_size, img_size, c), patches.dtype)
    idx = 0
    for i in range(dim):
        for j in range(dim):
            out = out.at[:, i * stride:i * stride + k,
                         j * stride:j * stride + k, :].add(patches[:, idx])
            idx += 1
    return out


def fold_unfold(x: jnp.ndarray, kernel: int, stride: int):
    """Unfold into patches, fold back with overlap-averaging
    (ref: img_utils.py:67-90): returns (patches, reassembled) where
    reassembled == x wherever the patch grid tiles the image."""
    patches = unfold_patches(x, kernel, stride)
    summed = fold_patches(patches, x.shape[1], stride)
    ones = fold_patches(jnp.ones_like(patches), x.shape[1], stride)
    return patches, summed / ones


def unnormalize(img: jnp.ndarray, s: float = 0.95) -> jnp.ndarray:
    """Divide by the s-quantile of |img| (ref: img_utils.py:230-232)."""
    return img / jnp.quantile(jnp.abs(img), s)


def normalize_quantile(img: jnp.ndarray, s: float = 0.95) -> jnp.ndarray:
    """Multiply by the s-quantile of |img| (ref: img_utils.py:235-237)."""
    return img * jnp.quantile(jnp.abs(img), s)


def dynamic_thresholding(img: jnp.ndarray, s: float = 0.95) -> jnp.ndarray:
    """Imagen-style dynamic thresholding (ref: img_utils.py:240-243; NB the
    reference composes *normalize* — multiply — then clips, and we mirror
    that exactly)."""
    return jnp.clip(normalize_quantile(img, s=s), -1.0, 1.0)


def total_variation_loss(img: jnp.ndarray, weight: float) -> jnp.ndarray:
    """Squared-difference TV on NHWC (ref: img_utils.py:358-361, which is
    NCHW; axes adjusted)."""
    tv_h = jnp.mean((img[:, 1:, :, :] - img[:, :-1, :, :]) ** 2)
    tv_w = jnp.mean((img[:, :, 1:, :] - img[:, :, :-1, :]) ** 2)
    return weight * (tv_h + tv_w)


def create_gaussian(size: int, sigma1: float,
                    sigma2: float = -1.0) -> np.ndarray:
    """Separable un-normalized Gaussian window (ref: img_utils.py:351-355)."""
    zs = np.arange(-size // 2 + 1, size // 2 + 1, dtype=np.float64)
    f1 = np.exp(-zs ** 2 / (2 * sigma1 ** 2)) / np.sqrt(2 * np.pi * sigma1 ** 2)
    if sigma2 == -1:
        f2 = f1
    else:
        f2 = (np.exp(-zs ** 2 / (2 * sigma2 ** 2))
              / np.sqrt(2 * np.pi * sigma2 ** 2))
    return np.outer(f1, f2)


def create_penalty_mask(k_size: int, penalty_scale: float) -> np.ndarray:
    """Boundary-penalty mask for kernel estimation
    (ref: img_utils.py:341-348)."""
    center_size = k_size // 2 + k_size % 2
    mask = create_gaussian(size=k_size, sigma1=k_size)
    mask = 1 - mask / np.max(mask)
    margin = (k_size - center_size) // 2 - 1
    mask[margin:-margin, margin:-margin] = 0
    return penalty_scale * mask


# Exact-posterior densities for tiny analytic studies
# (ref: img_utils.py:304-333 exact_posterior) — pure functions.

def log_py_given_x0(x0, y, forward_fn, sigma_0: float, input_dim: int):
    """log N(y; A x0, sigma_0^2 I) up to the reference's normalization
    (ref: img_utils.py:310-316)."""
    norm_const = 1.0 / ((2 * jnp.pi) ** input_dim * sigma_0 ** 2)
    exp_in = -1.0 / (2 * sigma_0 ** 2) * jnp.linalg.norm(
        (y - forward_fn(x0)).ravel()) ** 2
    return jnp.log(norm_const) + exp_in


def log_pxt_given_x0(x0, xt, beta_t, label_dim: int):
    """log N(xt; sqrt(1-beta_t) x0, beta_t I) up to the reference's
    normalization (ref: img_utils.py:318-324)."""
    norm_const = 1.0 / ((2 * jnp.pi) ** label_dim * beta_t)
    exp_in = -1.0 / (2 * beta_t) * jnp.linalg.norm(
        (xt - jnp.sqrt(1.0 - beta_t) * x0).ravel()) ** 2
    return jnp.log(norm_const) + exp_in


# ---------------------------------------------------------------------------
# Optical-flow visualization + reducers (generative-inpainting lineage,
# ref: dps_utils/tools.py:229-267, 270-296, 336-351, 372-398, 434-462,
# 502-527)
# ---------------------------------------------------------------------------


def reduce_mean(x: jnp.ndarray, axis=None, keepdim: bool = False):
    """Sequential per-axis mean (ref: tools.py:229-234)."""
    axes = range(x.ndim) if not axis else axis
    for i in sorted(axes, reverse=True):
        x = jnp.mean(x, axis=i, keepdims=keepdim)
    return x


def reduce_std(x: jnp.ndarray, axis=None, keepdim: bool = False):
    """Sequential per-axis std — NB std-of-std, matching the reference's
    fold (ref: tools.py:254-259), with torch's ddof=1."""
    axes = range(x.ndim) if not axis else axis
    for i in sorted(axes, reverse=True):
        x = jnp.std(x, axis=i, keepdims=keepdim, ddof=1)
    return x


def reduce_sum(x: jnp.ndarray, axis=None, keepdim: bool = False):
    """(ref: tools.py:262-267)"""
    axes = range(x.ndim) if not axis else axis
    for i in sorted(axes, reverse=True):
        x = jnp.sum(x, axis=i, keepdims=keepdim)
    return x


def make_color_wheel() -> np.ndarray:
    """Middlebury flow color wheel, 55 x 3 uint-valued
    (ref: tools.py:434-462)."""
    ry, yg, gc, cb, bm, mr = 15, 6, 4, 11, 13, 6
    wheel = np.zeros([ry + yg + gc + cb + bm + mr, 3])
    col = 0
    wheel[0:ry, 0] = 255
    wheel[0:ry, 1] = np.floor(255 * np.arange(ry) / ry)
    col += ry
    wheel[col:col + yg, 0] = 255 - np.floor(255 * np.arange(yg) / yg)
    wheel[col:col + yg, 1] = 255
    col += yg
    wheel[col:col + gc, 1] = 255
    wheel[col:col + gc, 2] = np.floor(255 * np.arange(gc) / gc)
    col += gc
    wheel[col:col + cb, 1] = 255 - np.floor(255 * np.arange(cb) / cb)
    wheel[col:col + cb, 2] = 255
    col += cb
    wheel[col:col + bm, 2] = 255
    wheel[col:col + bm, 0] = np.floor(255 * np.arange(bm) / bm)
    col += bm
    wheel[col:col + mr, 2] = 255 - np.floor(255 * np.arange(mr) / mr)
    wheel[col:col + mr, 0] = 255
    return wheel


def compute_color(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Flow vector field -> Middlebury color coding (ref: tools.py:372-398),
    fully vectorized (the reference already is, minus the channel loop)."""
    u = np.array(u, dtype=np.float64)
    v = np.array(v, dtype=np.float64)
    nan_idx = np.isnan(u) | np.isnan(v)
    u[nan_idx] = 0
    v[nan_idx] = 0
    wheel = make_color_wheel()
    ncols = wheel.shape[0]
    rad = np.sqrt(u ** 2 + v ** 2)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1) + 1
    k0 = np.floor(fk).astype(int)
    k1 = k0 + 1
    k1[k1 == ncols + 1] = 1
    f = fk - k0
    col0 = wheel[k0 - 1] / 255.0          # [H, W, 3]
    col1 = wheel[k1 - 1] / 255.0
    col = (1 - f[..., None]) * col0 + f[..., None] * col1
    small = (rad <= 1)[..., None]
    col = np.where(small, 1 - rad[..., None] * (1 - col), col * 0.75)
    return np.floor(255 * col * (1 - nan_idx[..., None])).astype(np.uint8) \
        .astype(np.float64)


def flow_to_image(flow: np.ndarray) -> np.ndarray:
    """[B, H, W, 2] flow -> [B, H, W, 3] color image, normalized by the
    batch max radius (ref: tools.py:270-296)."""
    flow = np.array(flow, dtype=np.float64)
    u = flow[..., 0]
    v = flow[..., 1]
    unknown = (np.abs(u) > 1e7) | (np.abs(v) > 1e7)
    u[unknown] = 0
    v[unknown] = 0
    maxrad = max(np.sqrt(u ** 2 + v ** 2).max(), -1)
    u = u / (maxrad + np.finfo(float).eps)
    v = v / (maxrad + np.finfo(float).eps)
    out = [compute_color(u[i], v[i]) for i in range(flow.shape[0])]
    return np.float32(np.uint8(out))


def highlight_flow(flow: np.ndarray) -> np.ndarray:
    """Mark integer flow endpoints on a gray canvas
    (ref: tools.py:336-351, incl. its square-loop quirk of iterating
    w over shape[1])."""
    s = flow.shape
    out = []
    for i in range(s[0]):
        img = np.ones((s[1], s[2], 3)) * 144.0
        u = flow[i, :, :, 0]
        v = flow[i, :, :, 1]
        for h in range(s[1]):
            for w in range(s[1]):
                img[int(u[h, w]), int(v[h, w]), :] = 255.0
        out.append(img)
    return np.float32(np.uint8(out))


def deprocess(img: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] -> [0,1] (ref: tools.py:502-504)."""
    return (img + 1.0) / 2.0


def get_model_list(dirname: str, key: str, iteration: int = 0):
    """Latest (or specific-iteration) .pt-style checkpoint path under a
    directory (ref: tools.py:514-527)."""
    import os
    if not os.path.exists(dirname):
        return None
    models = sorted(
        os.path.join(dirname, f) for f in os.listdir(dirname)
        if os.path.isfile(os.path.join(dirname, f)) and key in f
        and ".pt" in f)
    if not models:
        return None
    if iteration == 0:
        return models[-1]
    for model in models:
        if f"{iteration:08d}" in model:
            return model
    return None


def find_nearest(array, value) -> int:
    """Index of the nearest entry (ref: utils_model.py:202-205)."""
    array = np.asarray(array)
    return int(np.abs(array - value).argmin())


def grad_and_value(operator_fn, x_hat_fn, x, measurement):
    """DPS likelihood gradient: d/dx ||y - A(x_hat(x))|| and the norm itself
    (ref: utils_model.py:390-395, torch.autograd.grad on the norm) — as one
    jax.value_and_grad call so the forward is shared."""
    import jax

    def norm_fn(xx):
        diff = measurement - operator_fn(x_hat_fn(xx))
        return jnp.linalg.norm(diff.ravel())

    norm, grad = jax.value_and_grad(norm_fn)(x)
    return grad, norm
