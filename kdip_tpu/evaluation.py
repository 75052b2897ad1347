"""Distribution metrics: FID and KID over feature sets.

Equivalent of `k_diffusion/evaluation.py`: multi-device feature computation
(compute_features:53-63), polynomial-kernel MMD KID (kid:66-96), and FID via
an eigendecomposition matrix square root (sqrtm_eig, fid:99-134). The
feature extractor is pluggable (the reference uses InceptionV3 via clean-fid
or CLIP; any fn(batch)->[N, D] works — weights for those backbones are
converted offline like the UNet checkpoints).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def compute_features(sample_fn: Callable, extractor_fn: Callable, n: int,
                     batch_size: int, key) -> jnp.ndarray:
    """Streams batches from sample_fn(key, batch_size) through the feature
    extractor (ref: k_diffusion/evaluation.py:53-63; the accelerate gather
    becomes a device mesh concat when sample_fn is sharded)."""
    feats = []
    seen = 0
    i = 0
    while seen < n:
        cur = min(batch_size, n - seen)
        batch = sample_fn(jax.random.fold_in(key, i), batch_size)
        feats.append(extractor_fn(batch)[:cur])
        seen += cur
        i += 1
    return jnp.concatenate(feats)[:n]


def make_clip_extractor(model_path: str, mesh=None):
    """CLIP image-feature extractor (the reference's CLIPFeatureExtractor,
    k_diffusion/evaluation.py:36-50) via transformers' Flax CLIP vision
    tower. `model_path` must be a local checkpoint directory (this
    environment has no network egress). Returns fn(batch_nhwc_[-1,1]) ->
    [N, D] pooled features."""
    from transformers import FlaxCLIPVisionModel
    model = FlaxCLIPVisionModel.from_pretrained(model_path)
    size = model.config.image_size
    mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
    std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])

    @jax.jit
    def extract(batch):
        x = (batch + 1) / 2
        x = jax.image.resize(x, (x.shape[0], size, size, 3), "bicubic")
        x = (x - mean) / std
        out = model(pixel_values=x.transpose(0, 3, 1, 2))
        feats = out.pooler_output
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    return extract


def polynomial_kernel(x, y):
    """(ref: k_diffusion/evaluation.py:66-69)"""
    d = x.shape[-1]
    dot = x @ y.T
    return (dot / d + 1) ** 3


def squared_mmd(x, y, kernel=polynomial_kernel):
    """(ref: k_diffusion/evaluation.py:72-84)"""
    m = x.shape[0]
    n = y.shape[0]
    kxx = kernel(x, x)
    kyy = kernel(y, y)
    kxy = kernel(x, y)
    kxx_sum = kxx.sum() - jnp.trace(kxx)
    kyy_sum = kyy.sum() - jnp.trace(kyy)
    kxy_sum = kxy.sum()
    term_1 = kxx_sum / m / (m - 1)
    term_2 = kyy_sum / n / (n - 1)
    term_3 = kxy_sum * 2 / m / n
    return term_1 + term_2 - term_3


def kid(x, y, max_size: int = 5000, key=None) -> jnp.ndarray:
    """Unbiased KID estimate over chunked subsets
    (ref: k_diffusion/evaluation.py:87-96)."""
    x_size, y_size = x.shape[0], y.shape[0]
    n_partitions = int(np.ceil(max(x_size / max_size, y_size / max_size)))
    total_mmd = 0.0
    for i in range(n_partitions):
        cur_x = x[round(i * x_size / n_partitions):
                  round((i + 1) * x_size / n_partitions)]
        cur_y = y[round(i * y_size / n_partitions):
                  round((i + 1) * y_size / n_partitions)]
        total_mmd = total_mmd + squared_mmd(cur_x, cur_y)
    return total_mmd / n_partitions


def sqrtm_eig(a):
    """Matrix square root via symmetric eigendecomposition
    (ref: k_diffusion/evaluation.py:99-111 _MatrixSquareRootEig; jax
    differentiates through eigh natively, so no custom backward is needed)."""
    vals, vecs = jnp.linalg.eigh(a)
    vals = jnp.clip(vals, min=0.0)
    return (vecs * jnp.sqrt(vals)[None]) @ vecs.T


def fid(x, y, eps: float = 1e-8) -> jnp.ndarray:
    """Frechet distance between feature sets
    (ref: k_diffusion/evaluation.py:114-134)."""
    x_mean = x.mean(axis=0)
    y_mean = y.mean(axis=0)
    mean_term = jnp.sum((x_mean - y_mean) ** 2)
    n, m = x.shape[0], y.shape[0]
    x_cov = (x - x_mean).T @ (x - x_mean) / (n - 1)
    y_cov = (y - y_mean).T @ (y - y_mean) / (m - 1)
    eps_eye = jnp.eye(x_cov.shape[0]) * eps
    x_cov = x_cov + eps_eye
    y_cov = y_cov + eps_eye
    x_cov_sqrt = sqrtm_eig(x_cov)
    cov_term = jnp.trace(x_cov) + jnp.trace(y_cov) - 2 * jnp.trace(
        sqrtm_eig(x_cov_sqrt @ y_cov @ x_cov_sqrt))
    return mean_term + cov_term
