"""Training utilities: EMA schedules, LR schedules, sigma sample densities.

TPU-native equivalents of `k_diffusion/utils.py` (EMAWarmup:104-151,
InverseLR:152-190, ExponentialLR:193-231, sigma densities rand_log_normal..
rand_split_log_normal:234-272) and `k_diffusion/config.py:110-136
make_sample_density`. LR schedules are optax-style callables step -> scale;
EMA update is a pure pytree op.
"""

from __future__ import annotations

import math
from typing import Callable, Dict

import jax
import jax.numpy as jnp


def append_dims(x, target_ndim):
    from .schedules import append_dims as _ad
    return _ad(x, target_ndim)


# ---------------------------------------------------------------------------
# Precision (the bf16-native equivalent of guided_diffusion/fp16_util.py)
# ---------------------------------------------------------------------------

def cast_params(params, dtype):
    """Casts all float leaves of a param tree (the reference's
    convert_module_to_f16, fp16_util.py:15-32; on TPU the torso runs bf16
    with fp32 master params and needs no dynamic loss scaling)."""
    def cast(p):
        if jnp.issubdtype(p.dtype, jnp.floating):
            return p.astype(dtype)
        return p
    return jax.tree.map(cast, params)


def master_param_update(master_params, updates):
    """fp32 master-param pattern: apply (possibly lower-precision) updates to
    the fp32 master copy (fp16_util.py MixedPrecisionTrainer:148-236)."""
    return jax.tree.map(lambda m, u: (m.astype(jnp.float32)
                                      + u.astype(jnp.float32)), master_params,
                        updates)


def precast_inference_params(params, dtype=jnp.bfloat16,
                             keep=("GroupNorm_0",)):
    """Pre-casts f32 params to the torso compute dtype ONCE at the tree
    level, for inference with a low-precision torso.

    Numerically identical to leaving the tree f32: every flax module in the
    torso runs with dtype=bf16 / param_dtype=f32, so promote_dtype performs
    this exact cast per use-site anyway. Doing it once instead matters for
    HBM traffic: the per-use casts sit inside the sampling loop where they
    feed XLA's weight-packing custom-calls, which then stream the kernels
    in f32 — the round-5 vjp byte audit (RESULTS_VJP_AUDIT.json) measured
    2.18 GB of f32 traffic per guided NFE dropping to 0.45 GB with a
    pre-cast tree (instruction bytes 6.2 -> 5.18 GB/NFE).

    Params under a module name in `keep` stay f32: GroupNorm scale/bias
    feed the f32-statistics islands (the reference's GroupNorm32 contract,
    fp16_util.py:15-32 keeps norm layers f32 too). Training must NOT use
    this — the optimizer owns f32 master params (master_param_update)."""
    def cast(path, p):
        if any(getattr(k, "key", "") in keep for k in path):
            return p
        return p.astype(dtype) if p.dtype == jnp.float32 else p
    return jax.tree_util.tree_map_with_path(cast, params)


# ---------------------------------------------------------------------------
# EMA
# ---------------------------------------------------------------------------

def ema_update(ema_params, params, decay):
    """ema <- decay * ema + (1-decay) * params (ref: k_diffusion/utils.py:85-101)."""
    return jax.tree.map(lambda e, p: e * decay + p * (1 - decay), ema_params, params)


class EMAWarmup:
    """Inverse-power EMA decay warmup (ref: k_diffusion/utils.py:104-151).

    value(step) = (1 - 1/(step/inv_gamma + 1)^power), clamped to
    [min_value, max_value]."""

    def __init__(self, inv_gamma=1.0, power=1.0, min_value=0.0, max_value=1.0,
                 start_at=0, last_epoch=0):
        self.inv_gamma = inv_gamma
        self.power = power
        self.min_value = min_value
        self.max_value = max_value
        self.start_at = start_at
        self.last_epoch = last_epoch

    def get_value(self):
        epoch = max(0, self.last_epoch - self.start_at)
        value = 1 - (1 + epoch / self.inv_gamma) ** -self.power
        return 0.0 if epoch < 0 else min(self.max_value, max(self.min_value, value))

    def step(self):
        self.last_epoch += 1


# ---------------------------------------------------------------------------
# LR schedules (optax-compatible: step -> multiplier)
# ---------------------------------------------------------------------------

def inverse_lr(inv_gamma=1.0, power=1.0, warmup=0.0, final_lr=0.0) -> Callable:
    """InverseLR (ref: k_diffusion/utils.py:152-190)."""
    def schedule(step):
        lr_mult = (1 + step / inv_gamma) ** -power
        w = 1 - warmup ** (step + 1) if warmup else 1.0
        return w * jnp.maximum(final_lr, lr_mult)
    return schedule


def exponential_lr(num_steps, decay=0.5, warmup=0.0, final_lr=0.0) -> Callable:
    """ExponentialLR (ref: k_diffusion/utils.py:193-231)."""
    def schedule(step):
        lr_mult = decay ** (step / num_steps)
        w = 1 - warmup ** (step + 1) if warmup else 1.0
        return w * jnp.maximum(final_lr, lr_mult)
    return schedule


# ---------------------------------------------------------------------------
# Sigma sample densities (ref: k_diffusion/utils.py:234-272)
# ---------------------------------------------------------------------------

def rand_log_normal(key, shape, loc=0.0, scale=1.0):
    return jnp.exp(jax.random.normal(key, shape) * scale + loc)


def rand_log_logistic(key, shape, loc=0.0, scale=1.0,
                      min_value=0.0, max_value=float("inf")):
    min_cdf = jax.scipy.stats.logistic.cdf((math.log(min_value) - loc) / scale) \
        if min_value > 0 else 0.0
    max_cdf = (jax.scipy.stats.logistic.cdf((math.log(max_value) - loc) / scale)
               if max_value != float("inf") else 1.0)
    u = jax.random.uniform(key, shape, minval=min_cdf, maxval=max_cdf)
    return jnp.exp(jax.scipy.stats.logistic.ppf(u) * scale + loc)


def rand_log_uniform(key, shape, min_value, max_value):
    lo, hi = math.log(min_value), math.log(max_value)
    return jnp.exp(jax.random.uniform(key, shape, minval=lo, maxval=hi))


def rand_v_diffusion(key, shape, sigma_data=1.0, min_value=0.0,
                     max_value=float("inf")):
    min_cdf = math.atan(min_value / sigma_data) * 2 / math.pi
    max_cdf = (math.atan(max_value / sigma_data) * 2 / math.pi
               if max_value != float("inf") else 1.0)
    u = jax.random.uniform(key, shape, minval=min_cdf, maxval=max_cdf)
    return jnp.tan(u * math.pi / 2) * sigma_data


def rand_cosine_interpolated(key, shape, image_d=None, **kw):
    raise NotImplementedError("cosine-interpolated density not used by the paper")


def rand_cosine(key, shape, logsnr_min=-15.0, logsnr_max=15.0, sigma_data=1.0):
    """'cosine' density: sigma from uniformly sampled v-diffusion timestep
    (the train_ffhq_dwt.json setting, ref: config.py:124-127 maps 'cosine'
    to rand_v_diffusion with min/max from sigma bounds)."""
    return rand_v_diffusion(key, shape, sigma_data=sigma_data)


def rand_split_log_normal(key, shape, loc, scale_1, scale_2):
    k1, k2, k3 = jax.random.split(key, 3)
    n = jnp.abs(jax.random.normal(k1, shape))
    u = jax.random.uniform(k2, shape)
    ratio = scale_1 / (scale_1 + scale_2)
    value = jnp.where(u < ratio, loc - n * scale_1, loc + n * scale_2)
    return jnp.exp(value)


def make_sample_density(config: Dict, sigma_data: float = 1.0,
                        sigma_min: float = 1e-3, sigma_max: float = 1e3) -> Callable:
    """Density factory from a model config block (ref: k_diffusion/config.py:
    110-136). Returns fn(key, shape) -> sigmas."""
    sd = config.get("sigma_sample_density", {"type": "lognormal"})
    ty = sd["type"]
    if ty == "lognormal":
        loc = sd.get("mean", sd.get("loc", 0.0))
        scale = sd.get("std", sd.get("scale", 1.0))
        return lambda key, shape: rand_log_normal(key, shape, loc, scale)
    if ty == "loglogistic":
        loc = sd.get("loc", math.log(sigma_data))
        scale = sd.get("scale", 0.5)
        mn = sd.get("min_value", sigma_min)
        mx = sd.get("max_value", sigma_max)
        return lambda key, shape: rand_log_logistic(key, shape, loc, scale, mn, mx)
    if ty == "loguniform":
        mn = sd.get("min_value", sigma_min)
        mx = sd.get("max_value", sigma_max)
        return lambda key, shape: rand_log_uniform(key, shape, mn, mx)
    if ty in ("v-diffusion", "cosine"):
        mn = sd.get("min_value", sigma_min)
        mx = sd.get("max_value", sigma_max)
        return lambda key, shape: rand_v_diffusion(key, shape, sigma_data, mn, mx)
    if ty == "split-lognormal":
        loc = sd.get("mean", sd.get("loc", 0.0))
        s1 = sd.get("std_1", sd.get("scale_1", 1.0))
        s2 = sd.get("std_2", sd.get("scale_2", 1.0))
        return lambda key, shape: rand_split_log_normal(key, shape, loc, s1, s2)
    raise ValueError(f"Unknown sample density type {ty}")


# ---------------------------------------------------------------------------
# Misc small utilities (ref: k_diffusion/utils.py:16-66, 300-311)
# ---------------------------------------------------------------------------


def from_pil_image(img) -> "np.ndarray":
    """PIL image -> float HWC array in [-1, 1]
    (ref: k_diffusion/utils.py:16-22; NHWC instead of CHW)."""
    import numpy as np
    x = np.asarray(img, dtype=np.float32) / 255.0
    if x.ndim == 2:
        x = x[:, :, None]
    return x * 2.0 - 1.0


def to_pil_image(x):
    """[-1,1] array ([B,]H,W,C or H,W) -> PIL image
    (ref: k_diffusion/utils.py:24-31)."""
    import numpy as np
    from PIL import Image
    x = np.asarray(x)
    if x.ndim == 4:
        assert x.shape[0] == 1
        x = x[0]
    if x.ndim == 3 and x.shape[-1] == 1:
        x = x[..., 0]
    u8 = np.uint8(np.round((np.clip(x, -1.0, 1.0) + 1.0) * 127.5))
    return Image.fromarray(u8)


def n_params(params) -> int:
    """Total parameter count of a pytree (ref: k_diffusion/utils.py:48-50)."""
    import jax
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def download_file(path, url, digest=None):
    """Download `url` to `path` if absent, verifying SHA-256 when given
    (ref: k_diffusion/utils.py:53-65). No egress in the build sandbox —
    existing files still get hash-verified, which is the path used here."""
    import hashlib
    import shutil
    import urllib.request
    from pathlib import Path
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if not path.exists():
        with urllib.request.urlopen(url) as response, open(path, "wb") as f:
            shutil.copyfileobj(response, f)
    if digest is not None:
        file_digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
        if digest != file_digest:
            raise OSError(f"digest mismatch for {path} (downloaded from {url})")
    return path


class CSVLogger:
    """Append-mode CSV logger (ref: k_diffusion/utils.py:300-311)."""

    def __init__(self, filename, columns):
        from pathlib import Path
        self.filename = Path(filename)
        self.columns = columns
        if self.filename.exists():
            self.file = open(self.filename, "a")
        else:
            self.file = open(self.filename, "w")
            self.write(*self.columns)

    def write(self, *args):
        print(*args, sep=",", file=self.file, flush=True)


def enable_compilation_cache(path: str = None) -> str:
    """Persistent XLA compilation cache.

    TPU compiles of the 256px guided-sampler program take 30-400 s; caching
    them on disk makes every CLI invocation after the first start in
    seconds. The reference has no equivalent concern (eager torch). Safe to
    call multiple times. Returns the cache directory used.
    """
    import os
    import jax
    path = path or os.environ.get(
        "KDIP_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "kdip_tpu", "xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache even modestly sized programs; the default min size skips most
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
