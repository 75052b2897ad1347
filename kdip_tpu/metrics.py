"""Per-image quality metrics: PSNR, SSIM, LPIPS (TPU-native).

Equivalent of the reference's metric path (sample_condition_openai.py:41-68:
skimage PSNR/SSIM + lpips.LPIPS(net='vgg')), reimplemented as jittable JAX:

- `psnr` — peak signal-to-noise ratio.
- `ssim` — matches skimage.metrics.structural_similarity defaults (7x7
  uniform window, K1=0.01, K2=0.03, channel-averaged).
- `lpips_vgg` — the LPIPS-VGG distance: VGG16 features at the 5 standard
  taps, unit-normalized channels, learned 1x1 linear weights, spatially
  averaged. Weights are converted from the torchvision/lpips checkpoints via
  `convert_lpips_weights` (no torch needed at inference).
- `avg_metrics` / running aggregation matching avg_metrics.yaml
  (sample_condition_openai.py:52-68).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def to_eval(x: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] -> [0,1] clipped (ref: sample_condition_openai.py:42-43)."""
    return jnp.clip(x / 2 + 0.5, 0, 1)


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """PSNR over all dims except batch. a, b: [B, H, W, C] in [0, data_range]."""
    mse = jnp.mean((a - b) ** 2, axis=tuple(range(1, a.ndim)))
    return 10.0 * jnp.log10(data_range ** 2 / mse)


def _uniform_filter(x: jnp.ndarray, size: int = 7) -> jnp.ndarray:
    """Valid-mode uniform filter over H, W of [B, H, W, C]."""
    kernel = jnp.ones((size, size, 1, 1), x.dtype) / (size * size)
    C = x.shape[-1]
    kernel = jnp.tile(kernel, (1, 1, 1, C))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


def ssim_f64(a, b, data_range: float = 1.0, win_size: int = 7,
             k1: float = 0.01, k2: float = 0.03) -> np.ndarray:
    """Float64 host SSIM (exact skimage equivalence). The fp32 on-device
    version below can drift ~1e-2 above 1.0 on locally-degenerate windows
    (catastrophic cancellation in uxx - ux^2); per-image metric reporting
    uses this path. [B, H, W, C] inputs, returns [B]."""
    from numpy.lib.stride_tricks import sliding_window_view
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)

    def filt(x):  # x: [B, H, W, C]
        v = sliding_window_view(x, (win_size, win_size), axis=(1, 2))
        return v.mean(axis=(-2, -1))

    NP = win_size ** 2
    cov_norm = NP / (NP - 1)
    ux, uy = filt(a), filt(b)
    vx = cov_norm * (filt(a * a) - ux * ux)
    vy = cov_norm * (filt(b * b) - uy * uy)
    vxy = cov_norm * (filt(a * b) - ux * uy)
    C1, C2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))
    return S.mean(axis=tuple(range(1, S.ndim)))


def ssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0,
         win_size: int = 7, k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Structural similarity, matching skimage defaults (uniform window,
    channel-averaged, sample covariance normalization). [B, H, W, C] inputs.
    Jittable fp32 (on-device); for exact reported metrics prefer ssim_f64."""
    nd = 2  # spatial dims
    NP = win_size ** nd
    cov_norm = NP / (NP - 1)
    ux = _uniform_filter(a, win_size)
    uy = _uniform_filter(b, win_size)
    uxx = _uniform_filter(a * a, win_size)
    uyy = _uniform_filter(b * b, win_size)
    uxy = _uniform_filter(a * b, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    R = data_range
    C1 = (k1 * R) ** 2
    C2 = (k2 * R) ** 2
    A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
    B1, B2 = ux ** 2 + uy ** 2 + C1, vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    # skimage crops (win_size-1)//2 on each side of the *filtered* map; with
    # VALID convolution the crop is already applied.
    return jnp.mean(S, axis=tuple(range(1, S.ndim)))


# ---------------------------------------------------------------------------
# LPIPS (VGG16 backbone)
# ---------------------------------------------------------------------------

_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]
# taps after the ReLU of these conv indices (relu1_2, relu2_2, relu3_3,
# relu4_3, relu5_3) — the standard LPIPS slices
_LPIPS_TAPS = [1, 3, 6, 9, 12]

_IMAGENET_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_IMAGENET_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _vgg16_features(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """Runs VGG16 conv torso, returning the 5 LPIPS tap activations.
    x: [B, H, W, 3] in LPIPS's scaled space."""
    feats = []
    conv_idx = 0
    h = x
    for c in _VGG16_CFG:
        if c == "M":
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        else:
            w = params[f"conv{conv_idx}"]["kernel"]
            b = params[f"conv{conv_idx}"]["bias"]
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            h = jax.nn.relu(h)
            if conv_idx in _LPIPS_TAPS:
                feats.append(h)
            conv_idx += 1
    return feats


def lpips_vgg(params: Dict, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance with VGG backbone. a, b: [B, H, W, 3] in [0, 1]
    (matching the reference's usage on to_eval outputs,
    sample_condition_openai.py:46)."""
    # lpips scales [0,1] -> [-1,1] then normalizes by ImageNet-ish stats
    def norm_input(x):
        x = 2 * x - 1
        return (x - _IMAGENET_SHIFT) / _IMAGENET_SCALE

    fa = _vgg16_features(params, norm_input(a))
    fb = _vgg16_features(params, norm_input(b))
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / jnp.sqrt(jnp.sum(xa ** 2, axis=-1, keepdims=True) + 1e-10)
        nb = xb / jnp.sqrt(jnp.sum(xb ** 2, axis=-1, keepdims=True) + 1e-10)
        diff = (na - nb) ** 2
        lin = params[f"lin{i}"]["kernel"]  # [C] nonneg learned weights
        total = total + jnp.mean(jnp.sum(diff * lin, axis=-1),
                                 axis=(1, 2))
    return total


def convert_lpips_weights(vgg_state_dict, lpips_state_dict) -> Dict:
    """Converts torchvision VGG16 `features.*` conv weights and the lpips
    package's `lin{i}.model.1.weight` 1x1 convs into the param dict used by
    `lpips_vgg`."""
    params = {}
    conv_idx = 0
    layer = 0
    for c in _VGG16_CFG:
        if c == "M":
            layer += 1
            continue
        w = np.asarray(vgg_state_dict[f"features.{layer}.weight"])
        b = np.asarray(vgg_state_dict[f"features.{layer}.bias"])
        params[f"conv{conv_idx}"] = {"kernel": w.transpose(2, 3, 1, 0),
                                     "bias": b}
        conv_idx += 1
        layer += 2  # conv + relu
    for i in range(5):
        w = np.asarray(lpips_state_dict[f"lin{i}.model.1.weight"])  # [1, C, 1, 1]
        params[f"lin{i}"] = {"kernel": w[0, :, 0, 0]}
    return params


# ---------------------------------------------------------------------------
# Aggregation (ref: sample_condition_openai.py:41-68)
# ---------------------------------------------------------------------------

def compute_metrics(hat_x0, x0, lpips_params: Optional[Dict] = None) -> Dict[str, float]:
    """Per-image metric dict on [-1,1] NHWC tensors (batch element 0),
    matching compute_metrics (sample_condition_openai.py:41-49)."""
    a = to_eval(x0)
    b = to_eval(hat_x0)
    out = {"psnr": float(psnr(a, b)[0]), "ssim": float(ssim_f64(a, b)[0])}
    if lpips_params is not None:
        out["lpips"] = float(lpips_vgg(lpips_params, a, b)[0])
    return out


def calculate_average_metric(metrics_list: List[Dict[str, float]]) -> Dict[str, float]:
    """ref: sample_condition_openai.py:52-68"""
    avg, count = {}, {}
    for metrics in metrics_list:
        for k, v in metrics.items():
            avg[k] = avg.get(k, 0.0) + v
            count[k] = count.get(k, 0) + 1
    return {k: avg[k] / count[k] for k in avg if count[k] > 0}
