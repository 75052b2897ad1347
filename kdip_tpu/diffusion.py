"""Discrete DDPM coefficient tables and posterior math.

TPU-native equivalent of the reference's `guided_diffusion/gaussian_diffusion.py`
and `guided_diffusion/respace.py`. Instead of a stateful `GaussianDiffusion`
class, the schedule is a pytree of precomputed `jnp` coefficient tables
(`DiffusionTables`) plus pure functions operating on it — everything folds
into jitted XLA programs with static shapes and no host round-trips.

Coefficient definitions mirror guided_diffusion/gaussian_diffusion.py:118-169;
timestep respacing mirrors guided_diffusion/respace.py:7-113.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Union

import jax.numpy as jnp
import numpy as np


def get_named_beta_schedule(schedule_name: str, num_diffusion_timesteps: int) -> np.ndarray:
    """Named beta schedules (ref: gaussian_diffusion.py:18-42). float64 numpy."""
    if schedule_name == "linear":
        scale = 1000 / num_diffusion_timesteps
        beta_start = scale * 0.0001
        beta_end = scale * 0.02
        return np.linspace(beta_start, beta_end, num_diffusion_timesteps, dtype=np.float64)
    elif schedule_name == "cosine":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        return betas_for_alpha_bar(num_diffusion_timesteps, alpha_bar)
    else:
        raise NotImplementedError(f"unrecognized beta schedule {schedule_name!r}")


def betas_for_alpha_bar(num_diffusion_timesteps: int, alpha_bar, max_beta: float = 0.999) -> np.ndarray:
    """Discretize an alpha_bar function into betas (ref: gaussian_diffusion.py:45-62)."""
    betas = []
    for i in range(num_diffusion_timesteps):
        t1 = i / num_diffusion_timesteps
        t2 = (i + 1) / num_diffusion_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas)


def space_timesteps(num_timesteps: int, section_counts: Union[str, Sequence[int]]) -> set:
    """Choose which original-process timesteps a respaced run keeps.

    Accepts a comma-separated count string (one count per equal-length
    section of the original schedule), a "ddimN" string (strided DDIM
    spacing), or a sequence of ints; returns the kept original indices as a
    set. Output-equivalent to the reference respacing (ref: respace.py:7-60
    — oracle-tested in tests/test_schedules.py / test_script_util.py and
    swept exhaustively against it over random section lists).
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            want = int(section_counts[len("ddim"):])
            # a stride of s keeps ceil(T/s) indices; search for the stride
            # whose kept count hits the target exactly
            for stride in range(1, num_timesteps):
                if -(-num_timesteps // stride) == want:
                    return set(range(0, num_timesteps, stride))
            raise ValueError(
                f"no integer stride over {num_timesteps} timesteps keeps "
                f"exactly {want} DDIM steps")
        section_counts = [int(x) for x in section_counts.split(",")]

    n_sections = len(section_counts)
    base_len, leftover = divmod(num_timesteps, n_sections)
    chosen: set = set()
    offset = 0
    for i, count in enumerate(section_counts):
        length = base_len + (1 if i < leftover else 0)
        if count > length:
            raise ValueError(
                f"section {i} spans only {length} timesteps — too few to "
                f"pick {count} distinct steps from")
        if count >= 2:
            # evenly spaced from 0 to length-1 inclusive. The positions are
            # built by sequential accumulation (np.add.accumulate) rather
            # than linspace because published configs pin the EXACT rounded
            # index set, which depends on repeated-addition float error:
            # when a multiple of the stride is an exact x.5 in rationals,
            # accumulated floats land a hair off it and round the other way
            # than a multiply would. np.round's half-to-even matches the
            # builtin round the behavior is defined by.
            stride = (length - 1) / (count - 1)
            pos = np.empty(count)
            pos[0] = 0.0
            np.add.accumulate(np.full(count - 1, stride), out=pos[1:])
            chosen.update(int(offset + p) for p in np.round(pos))
        elif count == 1:
            chosen.add(offset)
        offset += length
    return chosen


class DiffusionTables(NamedTuple):
    """Precomputed DDPM coefficient tables (all shape [T], float32 jnp).

    Mirrors the arrays built in gaussian_diffusion.py:133-169 (computed in
    float64 then stored float32) plus the SpacedDiffusion timestep map
    (respace.py:72-86). Being a NamedTuple it is a pytree: it can be closed
    over by jitted functions or passed as an argument.
    """
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    log_betas: jnp.ndarray
    # EDM-style sigmas of each discrete timestep: sqrt((1-ac)/ac)
    # (ref: k_diffusion/external.py:88-93)
    sigmas: jnp.ndarray
    log_sigmas: jnp.ndarray
    # Map from respaced index -> original timestep index (respace.py:74-84).
    timestep_map: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_tables(betas: np.ndarray, timestep_map=None,
                dtype=jnp.float32) -> DiffusionTables:
    """Builds coefficient tables from betas in float64, stores as `dtype`
    jnp (float32 for production; float64 matches the reference's f64 numpy
    tables exactly — the tmpd CG system amplifies the f32 rounding of
    these coefficients by its condition number, see RESULTS.md)."""
    betas = np.asarray(betas, dtype=np.float64)
    assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_log_variance_clipped = np.log(np.append(posterior_variance[1], posterior_variance[1:]))
    posterior_mean_coef1 = betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_mean_coef2 = (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
    sigmas = np.sqrt((1 - alphas_cumprod) / alphas_cumprod)
    if timestep_map is None:
        timestep_map = np.arange(len(betas))
    f32 = lambda a: jnp.asarray(a, dtype=dtype)
    return DiffusionTables(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
        posterior_mean_coef1=f32(posterior_mean_coef1),
        posterior_mean_coef2=f32(posterior_mean_coef2),
        log_betas=f32(np.log(betas)),
        sigmas=f32(sigmas),
        log_sigmas=f32(np.log(sigmas)),
        timestep_map=jnp.asarray(np.asarray(timestep_map), dtype=jnp.int32),
    )


def make_diffusion(steps: int = 1000, noise_schedule: str = "linear",
                   timestep_respacing: Union[str, Sequence[int], None] = None,
                   dtype=jnp.float32) -> DiffusionTables:
    """Builds (possibly respaced) tables. Equivalent of
    script_util.create_gaussian_diffusion (ref: script_util.py:386-424) +
    SpacedDiffusion beta rewriting (ref: respace.py:77-86)."""
    betas = get_named_beta_schedule(noise_schedule, steps)
    if not timestep_respacing:
        return make_tables(betas, dtype=dtype)
    use_timesteps = space_timesteps(steps, timestep_respacing)
    base_ac = np.cumprod(1.0 - betas)
    last_alpha_cumprod = 1.0
    new_betas, timestep_map = [], []
    for i, ac in enumerate(base_ac):
        if i in use_timesteps:
            new_betas.append(1 - ac / last_alpha_cumprod)
            last_alpha_cumprod = ac
            timestep_map.append(i)
    return make_tables(np.array(new_betas), np.array(timestep_map), dtype=dtype)


def extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gathers table[t] (t: [B] int) and appends dims for broadcasting against
    an `ndim`-dimensional batch tensor (ref: gaussian_diffusion.py:895-907)."""
    out = table[t]
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def q_sample(tables: DiffusionTables, x_start, t, noise):
    """Samples q(x_t | x_0) (ref: gaussian_diffusion.py:188-206)."""
    nd = x_start.ndim
    return (extract(tables.sqrt_alphas_cumprod, t, nd) * x_start
            + extract(tables.sqrt_one_minus_alphas_cumprod, t, nd) * noise)


def q_posterior_mean_variance(tables: DiffusionTables, x_start, x_t, t):
    """Mean/variance of q(x_{t-1} | x_t, x_0) (ref: gaussian_diffusion.py:208-230)."""
    nd = x_t.ndim
    posterior_mean = (extract(tables.posterior_mean_coef1, t, nd) * x_start
                      + extract(tables.posterior_mean_coef2, t, nd) * x_t)
    posterior_variance = extract(tables.posterior_variance, t, nd)
    posterior_log_variance = extract(tables.posterior_log_variance_clipped, t, nd)
    return posterior_mean, posterior_variance, posterior_log_variance


def predict_xstart_from_eps(tables: DiffusionTables, x_t, t, eps):
    """(ref: gaussian_diffusion.py:328-333)"""
    nd = x_t.ndim
    return (extract(tables.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - extract(tables.sqrt_recipm1_alphas_cumprod, t, nd) * eps)


def predict_eps_from_xstart(tables: DiffusionTables, x_t, t, pred_xstart):
    """(ref: gaussian_diffusion.py:345-349)"""
    nd = x_t.ndim
    return (extract(tables.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - pred_xstart) / extract(tables.sqrt_recipm1_alphas_cumprod, t, nd)


def learned_range_variance(tables: DiffusionTables, model_var_values, t):
    """LEARNED_RANGE variance interpolation (ref: gaussian_diffusion.py:262-276).

    model_var_values in [-1, 1] interpolates log-variance between
    posterior_log_variance_clipped (min) and log(betas) (max).
    Returns (model_variance, model_log_variance).
    """
    nd = model_var_values.ndim
    min_log = extract(tables.posterior_log_variance_clipped, t, nd)
    max_log = extract(tables.log_betas, t, nd)
    frac = (model_var_values + 1) / 2
    model_log_variance = frac * max_log + (1 - frac) * min_log
    return jnp.exp(model_log_variance), model_log_variance


def p_mean_variance(tables: DiffusionTables, model_output, x, t, clip_denoised: bool = True,
                    learn_sigma: bool = True, predict_xstart: bool = False,
                    sigma_small: bool = False):
    """p(x_{t-1} | x_t) stats from raw model output
    (ref: gaussian_diffusion.py:232-326).

    `model_output`: raw UNet output; with `learn_sigma` its channel dim is 2C
    (eps/x0 concat var values -> LEARNED_RANGE). Without it, the variance is
    FIXED_LARGE, or FIXED_SMALL with `sigma_small`
    (ref: gaussian_diffusion.py:75-86 ModelVarType). `predict_xstart` switches
    the mean head from EPSILON to START_X (ref: ModelMeanType:65-71).
    Channels-last (NHWC) layout. `t` is the respaced integer timestep index
    [B] — the timestep_map remapping for the model call itself
    (respace.py:116-128) is handled by the model adapter.
    Returns dict(mean, variance, log_variance, pred_xstart).
    """
    nd = x.ndim
    if learn_sigma:
        C = x.shape[-1]
        head, model_var_values = model_output[..., :C], model_output[..., C:]
        model_variance, model_log_variance = learned_range_variance(tables, model_var_values, t)
    elif sigma_small:
        head = model_output
        # FIXED_SMALL (ref: gaussian_diffusion.py:292-295)
        model_variance = extract(tables.posterior_variance, t, nd)
        model_log_variance = extract(tables.posterior_log_variance_clipped, t, nd)
    else:
        head = model_output
        # FIXED_LARGE (ref: gaussian_diffusion.py:278-291)
        fl = jnp.concatenate([tables.posterior_variance[1:2], tables.betas[1:]])
        model_variance = extract(fl, t, nd)
        model_log_variance = jnp.log(model_variance)
    if predict_xstart:
        pred_xstart = head
    else:
        pred_xstart = predict_xstart_from_eps(tables, x, t, head)
    if clip_denoised:
        pred_xstart = jnp.clip(pred_xstart, -1, 1)
    model_mean, _, _ = q_posterior_mean_variance(tables, pred_xstart, x, t)
    return {
        "mean": model_mean,
        "variance": model_variance,
        "log_variance": model_log_variance,
        "pred_xstart": pred_xstart,
    }


def convert_x0_var(tables: DiffusionTables, model_variance, t):
    """"Convert" posterior covariance, Eq. (22) of the paper
    (ref: condition/condition.py:241-248).

    x0_var = (reverse_variance - posterior_variance[t]) / posterior_mean_coef1[t]^2,
    clipped to >= 1e-6.
    """
    nd = model_variance.ndim
    pv = extract(tables.posterior_variance, t, nd)
    c1 = extract(tables.posterior_mean_coef1, t, nd)
    return jnp.clip((model_variance - pv) / c1 ** 2, min=1e-6)


def model_timesteps(tables: DiffusionTables, t, rescale_timesteps: bool = False,
                    original_num_steps: int = 1000):
    """The timestep values to feed the model for respaced chain index `t`:
    timestep_map remapping (ref: respace.py:116-128 _WrappedModel) plus the
    optional float rescale to the 0..1000 range
    (ref: gaussian_diffusion.py:351-354 _scale_timesteps)."""
    t = jnp.asarray(t)
    if tables.timestep_map is not None:
        t = tables.timestep_map[t.astype(jnp.int32)]
    if rescale_timesteps:
        return t.astype(jnp.float32) * (1000.0 / original_num_steps)
    return t.astype(jnp.float32)
