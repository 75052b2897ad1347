"""Conditional denoising: E[x0 | xt, y] approximations (the guidance core).

TPU-native redesign of `condition/condition.py`. The reference implements
guidance as stateful nn.Modules using torch autograd replays
(condition.py:41-208) and solves the likelihood systems with scipy CG on CPU
(condition.py:326-346, 360-384, 413-437). Here:

- the unconditional posterior-moment predictor `uncond_pred(x, sigma) ->
  (x0_mean, aux)` is a pure function; guidance scores come from `jax.vjp`
  through it (one extra backward per step, fused into the same XLA program);
- the "mat" likelihood solves run as batched conjugate gradients entirely
  on-device (`jax.scipy.sparse.linalg.cg`) — no host round-trips;
- the guidance mode and covariance type are static configuration: each
  combination traces to its own specialized program; the `*+mle` threshold
  switches are `lax.cond` on sigma;
- everything is batched ([B, H, W, C]); the reference's batch=1 assertion
  (condition.py:84) is lifted.

Guidance modes (ref: condition.py:83-131): uncond, I, II, dps, pgdm, diffpir,
stsl, autoI, dps+mle, pgdm+mle, stsl+mle.
Covariance types (ref: condition.py:236-272): convert, analytic, pgdm, dps,
diffpir, tmpd; plus the V2 learned (DWT/DCT) heads.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import diffusion as diff
from . import precond
from .operators import (BlurOperator, InpaintingOperator, Measurement,
                        SuperResolutionOperator)
from .ops import fft as offt
from .ops.transforms import OrthoTransform
from .schedules import append_dims


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
    """Static guidance configuration (ref: ConditionDenoiser.__init__,
    condition.py:44-71 + CLI flags sample_condition_openai.py:94-100)."""
    guidance: str = "I"
    x0_cov_type: str = "convert"
    mle_sigma_thres: float = 0.2
    zeta: Optional[float] = None
    lambda_: Optional[float] = None
    eta: Optional[float] = None
    num_hutchinson_samples: Optional[int] = None
    ortho_tf_type: Optional[str] = None
    # CG controls (ref uses scipy tol=1e-4, maxiter=1000, condition.py:343).
    # cg_maxiter=None resolves to the reference's 1000-iteration budget:
    # because the while_loop exits as soon as the residual passes tol, a
    # large cap costs nothing on converging systems, while the
    # tensor-variance regimes (tmpd, and the V2 learned heads below the mle
    # threshold) measured needing several hundred iterations (RESULTS.md
    # r3: ~393 on tmpd/gaussian-blur) and would be silently truncated by a
    # smaller one.
    cg_tol: float = 1e-4
    cg_maxiter: Optional[int] = None
    # Optionally precondition CG with the closed-form isotropic solve at the
    # mean variance. 36% fewer iterations on near-isotropic covariances
    # (convert below threshold), but actively HARMFUL on wide-dynamic-range
    # fields: with tmpd at sigma=80 (theta in [0, 6.4e3], mean 64) the
    # preconditioned solve is ~0.87 rel-L2 from the true solution at 100
    # iters where the plain solve is 1.6e-3 (scripts/debug_tmpd_blur.py).
    # Default OFF — correctness first, matching the reference's
    # unpreconditioned scipy CG; opt in per-run when the covariance is known
    # to be near-isotropic.
    cg_precondition: bool = False
    # Print a device-side warning when a CG solve exits above tolerance
    # (the reference's scipy warning, condition.py:344-345). The residual
    # is read from the CG loop state so the check costs nothing; on by
    # default — silent truncation in the wide-dynamic-range tmpd regime
    # is exactly where a bad solve would corrupt results.
    cg_warn: bool = True
    # Warm-start each CG solve from the previous sampler step's solution
    # (an extension: the reference's scipy.sparse.linalg.cg always starts
    # from zero, condition.py:343). Adjacent Karras steps solve nearly
    # identical systems — theta0_var and the residual b drift slowly — so
    # the previous u is a far better initial iterate than 0. The solve
    # still converges to the same tolerance (tol * |b|), so results match
    # the cold solve within cg_tol; only the iteration count drops. Wired
    # through samplers.sample_heun / sample_euler via a solver-state carry;
    # only meaningful for guidance I/II with a tensor/switch covariance
    # (tmpd, convert, the V2 heads). Default OFF (reference semantics).
    cg_warm_start: bool = False
    # autoI probe count for the stochastic trace term
    num_probes: int = 8
    # Rematerialize the denoiser in guidance VJPs (numerically identical).
    # On v5e the *isolated* per-sample vjp is ~2.5% faster with full remat
    # (scripts/profile_vjp_batch.py: 11.92 vs 12.22 ms/sample), but in the
    # full guided sampler the vjp is consumed inside the solver's lax.cond
    # branches and remat measurably HURTS end-to-end throughput
    # (bench.py: 0.646 vs 0.912 samples/s) — each branch carries its own
    # recompute graph and the scheduler loses the overlap it had with saved
    # activations. Default OFF; the knob exists for workloads whose vjp is
    # consumed once outside control flow.
    #
    # True = full remat. The string "conv_dots" = selective: save only
    # conv/dot (MXU) outputs and recompute elementwise chains (GroupNorm
    # applies, SiLU, converts) in the backward pass — the byte-heavy
    # residuals are exactly the cheap-to-recompute ones (round-5 vjp byte
    # audit). Any jax.checkpoint_policies name is also accepted.
    remat_vjp: Any = False


def resolved_cg_maxiter(cfg: "GuidanceConfig") -> int:
    """The effective CG iteration budget (see GuidanceConfig.cg_maxiter)."""
    return 1000 if cfg.cg_maxiter is None else cfg.cg_maxiter


def _remat_policy(spec):
    """Resolves GuidanceConfig.remat_vjp to a jax.checkpoint policy.

    True -> None (full remat: save nothing). "conv_dots" -> save every MXU
    output (conv_general_dilated / dot_general) and recompute only the
    elementwise chains between them — the byte-heavy saved residuals the
    round-5 vjp audit found are exactly those cheap chains. Any other
    string -> the same-named member of jax.checkpoint_policies."""
    if spec is True:
        return None
    if spec == "conv_dots":
        return lambda prim, *_, **__: prim.name in (
            "conv_general_dilated", "dot_general")
    return getattr(jax.checkpoint_policies, spec)


def mle_var(sigma):
    """High-sigma fallback variance sigma^2/(1+sigma^2)
    (ref: condition.py:248, 256, 259, 297-298)."""
    return sigma ** 2 / (1 + sigma ** 2)


# ---------------------------------------------------------------------------
# Unconditional posterior moments for the OpenAI (ADM) model family
# ---------------------------------------------------------------------------

def make_openai_uncond(model_apply: Callable, tables: diff.DiffusionTables,
                       cfg: GuidanceConfig,
                       recon_mse: Optional[Dict[str, jnp.ndarray]] = None):
    """uncond_pred for ConditionOpenAIDenoiser (ref: condition.py:231-274).

    model_apply(params, x_scaled, t_int) -> raw UNet output (2C channels,
    eps + var values). Returns fn(params, x, sigma) -> (x0_mean, aux) where
    aux carries what each covariance backend needs. The tmpd covariance is
    computed by the caller from the vjp (it is d sum(x0_mean) / dx * sigma^2,
    ref: condition.py:268-269).
    """
    def uncond_pred(params, x, sigma):
        c_out, c_in = precond.eps_scalings(sigma)
        t = precond.sigma_to_t(tables.log_sigmas, sigma).astype(jnp.int32)  # floor, like .long()
        t_b = jnp.broadcast_to(t, (x.shape[0],))
        model_output = model_apply(params, x * append_dims(c_in, x.ndim), t_b)
        out = diff.p_mean_variance(tables, model_output, x * append_dims(c_in, x.ndim),
                                   t_b, clip_denoised=True, learn_sigma=True)
        x0_mean = out["pred_xstart"]
        # t is kept float in aux so the whole aux pytree is differentiable
        # (vjp cotangents must be floats); x0_var_fn casts back for indexing.
        aux = {"variance": out["variance"], "t": t_b.astype(jnp.float32)}
        return x0_mean, aux

    def x0_var_fn(aux, sigma, x0_mean_vjp=None, x_shape=None):
        """Covariance dispatch (static on cfg.x0_cov_type)."""
        ct = cfg.x0_cov_type
        if ct == "convert":
            eq22 = diff.convert_x0_var(tables, aux["variance"],
                                       aux["t"].astype(jnp.int32))
            return jnp.where(sigma < cfg.mle_sigma_thres, eq22, mle_var(sigma))
        if ct == "analytic":
            assert recon_mse is not None, "analytic covariance needs recon_mse"
            idx = jnp.argmin(jnp.abs(recon_mse["sigmas"] - sigma))
            return jnp.where(sigma < cfg.mle_sigma_thres,
                             recon_mse["mse_list"][idx], mle_var(sigma))
        if ct == "pgdm":
            return mle_var(sigma)
        if ct == "dps":
            return jnp.zeros(())
        if ct == "diffpir":
            assert cfg.lambda_ is not None
            return sigma ** 2 / cfg.lambda_
        if ct == "tmpd":
            assert x0_mean_vjp is not None
            ones = jnp.ones(x_shape)
            return x0_mean_vjp(ones)[0] * sigma ** 2
        raise ValueError(f"unrecognized posterior covariance type {cfg.x0_cov_type!r}")

    return uncond_pred, x0_var_fn


def make_openai_v2_uncond(model_apply: Callable, tables: diff.DiffusionTables,
                          cfg: GuidanceConfig):
    """uncond_pred for ConditionOpenAIDenoiserV2 (ref: condition.py:287-300).

    model_apply(params, x_scaled, t) -> (model_output_eps, logvar, logvar_ot)
    (the OpenAIDenoiserV2 forward, ref: external.py:161-169).
    Returns fn -> (x0_mean, aux{logvar, logvar_ot}).
    """
    def uncond_pred(params, x, sigma):
        c_out, c_in = precond.eps_scalings(sigma)
        t = precond.sigma_to_t(tables.log_sigmas, sigma)
        t_b = jnp.broadcast_to(t, (x.shape[0],))
        model_output, logvar, logvar_ot = model_apply(
            params, x * append_dims(c_in, x.ndim), t_b)
        x0_mean = model_output * append_dims(c_out, x.ndim) + x
        return x0_mean, {"logvar": logvar, "logvar_ot": logvar_ot}

    def x0_var_fn(aux, sigma, x0_mean_vjp=None, x_shape=None):
        c_out, _ = precond.eps_scalings(sigma)
        c_out2 = append_dims(c_out ** 2, aux["logvar"].ndim)
        x0_var = jnp.where(sigma < cfg.mle_sigma_thres,
                           jnp.exp(aux["logvar"]) * c_out2, mle_var(sigma))
        theta0_var = jnp.where(sigma < cfg.mle_sigma_thres,
                               jnp.exp(aux["logvar_ot"]) * c_out2, mle_var(sigma))
        return x0_var, theta0_var

    return uncond_pred, x0_var_fn


def make_kdiff_v2_uncond(model_apply: Callable, cfg: GuidanceConfig,
                         sigma_data: float = 0.5):
    """uncond_pred for the k-diffusion NATIVE variance model
    (ImageDenoiserModelV2, the DCT-Var config `configs/test_ffhq_dct.json`).

    The reference ships that test config but no entry point consumes it
    (no script builds image_v2 models for guided sampling) — this is the
    natural extension: the same learned-covariance treatment as the OpenAI
    V2 path (ref: condition.py:287-300) with EDM c_skip/c_out/c_in
    preconditioning (ref: k_diffusion/layers.py:13-37) instead of the
    discrete-eps scalings.

    model_apply(params, x_scaled, sigma) -> (model_output, logvar,
    logvar_ot), the raw triple from ImageDenoiserModelV2 with
    return_variance=True.
    """
    def uncond_pred(params, x, sigma):
        c_skip, c_out, c_in = precond.edm_scalings(sigma, sigma_data)
        sigma_b = jnp.broadcast_to(sigma, (x.shape[0],))
        model_output, logvar, logvar_ot = model_apply(
            params, x * append_dims(c_in, x.ndim), sigma_b)
        x0_mean = (model_output * append_dims(c_out, x.ndim)
                   + x * append_dims(c_skip, x.ndim))
        return x0_mean, {"logvar": logvar, "logvar_ot": logvar_ot}

    def x0_var_fn(aux, sigma, x0_mean_vjp=None, x_shape=None):
        _, c_out, _ = precond.edm_scalings(sigma, sigma_data)
        c_out2 = append_dims(c_out ** 2, aux["logvar"].ndim)
        x0_var = jnp.where(sigma < cfg.mle_sigma_thres,
                           jnp.exp(aux["logvar"]) * c_out2, mle_var(sigma))
        theta0_var = jnp.where(sigma < cfg.mle_sigma_thres,
                               jnp.exp(aux["logvar_ot"]) * c_out2,
                               mle_var(sigma))
        return x0_var, theta0_var

    return uncond_pred, x0_var_fn


# ---------------------------------------------------------------------------
# Mat solvers: v = (sigma_s^2 I + A Sigma A^T)^{-1} (y - A x0_mean), returned
# pulled back through A^T where applicable (ref: condition.py:303-439)
# ---------------------------------------------------------------------------

def _cg_with_residual(matvec, b, tol, maxiter, M=None, x0=None):
    """Conjugate gradients mirroring jax.scipy.sparse.linalg.cg's update
    order exactly (jax/_src/scipy/sparse/linalg.py:103-136: same vdot
    precision, same dtype casts, same stopping rule), so iterates are
    bit-identical to `jax_cg` when x0 is None — but additionally returning
    the loop-carried residual norm^2, the convergence threshold, and the
    iteration count, which makes a non-convergence check free (no extra
    matvec). x0 (default zeros, like scipy) supports warm-starting; the
    stopping rule tol*|b| is unchanged, matching scipy's x0 semantics.
    Real arrays only. Never differentiated through: every caller
    stop_gradients the result."""
    from functools import partial
    rdot = partial(jnp.vdot, precision=lax.Precision.HIGHEST)
    m_identity = M is None
    if m_identity:
        M = lambda v: v
    bs = rdot(b, b)
    atol2 = jnp.square(jnp.asarray(tol, bs.dtype)) * bs
    x0 = jnp.zeros_like(b) if x0 is None else x0.astype(b.dtype)
    r0 = b - matvec(x0)
    p0 = z0 = M(r0)
    gamma0 = rdot(r0, z0).astype(b.dtype)

    def cond_fun(value):
        _, r, gamma, _, k = value
        rs = gamma.real if m_identity else rdot(r, r)
        return (rs > atol2) & (k < maxiter)

    def body_fun(value):
        x, r, gamma, p, k = value
        Ap = matvec(p)
        alpha = gamma / rdot(p, Ap).astype(b.dtype)
        x_ = x + alpha * p
        r_ = r - alpha * Ap
        z_ = M(r_)
        gamma_ = rdot(r_, z_).astype(b.dtype)
        beta_ = gamma_ / gamma
        p_ = z_ + beta_ * p
        return x_, r_, gamma_, p_, k + 1

    x, r, gamma, _, k = lax.while_loop(
        cond_fun, body_fun, (x0, r0, gamma0, p0, 0))
    rs = gamma.real if m_identity else rdot(r, r)
    return x, rs, atol2, k


def _host_callbacks_supported() -> bool:
    """jax.debug.print needs host send/recv callbacks, which some PJRT
    plugins (the axon TPU tunnel) do not implement — there the warning
    cannot even be lowered, so it is gated at trace time. The axon plugin
    registers a backend named 'axon' that reports platform 'tpu', so the
    registry (not default_backend()) is the reliable probe."""
    try:
        from jax._src import xla_bridge
        return "axon" not in xla_bridge.backends()
    except Exception:
        return True


def _cg(matvec, b, cfg: GuidanceConfig, M=None, x0=None, want_iters=False):
    """Runs CG and returns (x, rel_resid) where rel_resid = |r|/|b| at exit
    (0-for-0 when b == 0). The residual comes from the CG loop state, so
    surfacing it is free (no extra matvec); callers thread it out through
    the sampler so truncated solves are VISIBLE on hardware without host
    callbacks (VERDICT r4 #2 — the axon plugin cannot lower
    jax.debug.print, which used to compile the warning out exactly on the
    real chip). x0 warm-starts the solve (see GuidanceConfig.cg_warm_start);
    want_iters=True appends the iteration count: (x, rel_resid, iters)."""
    x, rs, atol2, k = _cg_with_residual(
        matvec, b, cfg.cg_tol, resolved_cg_maxiter(cfg),
        M=M if cfg.cg_precondition else None, x0=x0)
    bs = atol2 / jnp.square(jnp.asarray(cfg.cg_tol, rs.dtype))
    rel = jnp.sqrt(rs / jnp.maximum(bs, jnp.finfo(rs.dtype).tiny))
    if cfg.cg_warn and _host_callbacks_supported():
        # the reference warns when scipy CG exits without converging
        # (condition.py:344-345); kept where host callbacks exist (CPU).
        lax.cond(
            rs > atol2,
            lambda: jax.debug.print(
                "CG did not converge in {m} iters: |r|/|b| = {r}",
                m=resolved_cg_maxiter(cfg), r=rel),
            lambda: None)
    if want_iters:
        return x, rel.astype(jnp.float32), k
    return x, rel.astype(jnp.float32)


# Residual reported by closed-form (exact) solves. A numpy scalar, NOT a
# jnp array: a module-level jnp constant would initialize the XLA backend
# at import time, which forbids jax.distributed.initialize() afterwards
# (importing the package must never touch a backend — multihost processes
# import kdip_tpu.parallel.dist first and rendezvous before any jax op).
_NO_RESID = np.float32(0.0)


def _closed(mat, u0, want_state):
    """Closed-form solver return: no CG ran, so the residual is exactly 0
    and (with want_state) the warm-start carry u0 passes through unchanged
    — keeping the state pytree identical across lax.cond branches."""
    if want_state:
        return mat, _NO_RESID, {"u": u0, "iters": jnp.asarray(0, jnp.int32)}
    return mat, _NO_RESID


def _via_cg(matvec, b, cfg, M, u0, want_state):
    """CG solver return: (u, resid) or with want_state
    (u, resid, {"u": u, "iters": k}) — u is the raw CG variable (the next
    step's warm start), which callers may still post-process into mat."""
    if want_state:
        u, resid, k = _cg(matvec, b, cfg, M=M, x0=u0, want_iters=True)
        return u, resid, {"u": u, "iters": jnp.asarray(k, jnp.int32)}
    u, resid = _cg(matvec, b, cfg, M=M, x0=u0)
    return u, resid


def inpainting_mat(op: InpaintingOperator, y, x0_mean, theta0_var, ortho_tf,
                   iso: bool, cfg: GuidanceConfig, *, u0=None,
                   want_state=False):
    """(ref: condition.py:317-348)"""
    mask = op.mask
    sigma_s = jnp.clip(op.sigma_s, min=0.001)
    b = mask * y - mask * x0_mean
    if iso:
        return _closed(b / (sigma_s ** 2 + theta0_var), u0, want_state)
    ot, iot = ortho_tf, ortho_tf.inv

    def matvec(v):
        return sigma_s ** 2 * v + mask * iot(theta0_var * ot(v))

    # Jacobi-style preconditioner: the closed-form isotropic solve at the
    # mean variance (exact inverse when theta0_var is constant and the
    # ortho transform is the identity).
    theta_bar = jnp.mean(theta0_var)

    def precond(v):
        return v / (sigma_s ** 2 + mask * theta_bar)

    return _via_cg(matvec, b, cfg, precond, u0, want_state)


def deblur_mat(op: BlurOperator, y, x0_mean, theta0_var, ortho_tf,
               iso: bool, cfg: GuidanceConfig, *, u0=None, want_state=False):
    """(ref: condition.py:351-398)"""
    sigma_s = jnp.clip(op.sigma_s, min=0.001)
    FB, FBC, F2B = op.FB, op.FBC, op.F2B
    if iso:
        num = offt.fft2(y - offt.ifft2(FB[..., None] * offt.fft2(x0_mean)).real)
        mat = offt.ifft2(num / (sigma_s ** 2 + theta0_var * F2B[..., None])
                         * FBC[..., None]).real
        return _closed(mat, u0, want_state)
    ot, iot = ortho_tf, ortho_tf.inv
    b = y - offt.ifft2(FB[..., None] * offt.fft2(x0_mean)).real

    def matvec(u):
        Au = offt.ifft2(FBC[..., None] * offt.fft2(u)).real
        Cu = iot(theta0_var * ot(Au))
        return sigma_s ** 2 * u + offt.ifft2(FB[..., None] * offt.fft2(Cu)).real

    # preconditioner: exact FFT inverse of the isotropic system at the mean
    # variance, (sigma_s^2 + theta_bar |FB|^2)^{-1} in the Fourier domain
    theta_bar = jnp.mean(theta0_var)

    def precond(u):
        return offt.ifft2(offt.fft2(u)
                          / (sigma_s ** 2 + theta_bar * F2B[..., None])).real

    out = _via_cg(matvec, b, cfg, precond, u0, want_state)
    mat = offt.ifft2(FBC[..., None] * offt.fft2(out[0])).real
    return (mat,) + out[1:]


def super_resolution_mat(op: SuperResolutionOperator, y, x0_mean, theta0_var,
                         ortho_tf, iso: bool, cfg: GuidanceConfig, *,
                         u0=None, want_state=False):
    """(ref: condition.py:401-439).

    Note the solver uses the FFT kernel representation of A (blur+downsample),
    not the exact bicubic forward — matching the reference."""
    sigma_s = jnp.clip(op.sigma_s, min=1e-2)
    sf = op.scale_factor
    FB, FBC, F2B = op.FB, op.FBC, op.F2B

    def A_fft(x):
        return offt.downsample(offt.ifft2(FB[..., None] * offt.fft2(x)), sf)

    def AT_fft(u):
        return offt.ifft2(FBC[..., None] * offt.fft2(offt.upsample(u, sf)))

    if iso:
        # invW = mean over the sf x sf aliasing blocks of |FB|^2
        # (ref: condition.py:409 via sr.splits)
        H, W = F2B.shape[-2:]
        invW = jnp.mean(jnp.asarray(F2B).reshape(sf, H // sf, sf, W // sf)
                        .transpose(1, 3, 0, 2).reshape(H // sf, W // sf, -1),
                        axis=-1)
        num = offt.fft2(y - A_fft(x0_mean).real)
        denom = sigma_s ** 2 + theta0_var * invW[..., None]
        mat = offt.ifft2(FBC[..., None] * jnp.tile(num / denom, (1, sf, sf, 1))).real
        return _closed(mat, u0, want_state)
    ot, iot = ortho_tf, ortho_tf.inv
    b = (y - A_fft(x0_mean).real)

    def matvec(u):
        ATu = AT_fft(u).real
        Cu = iot(theta0_var * ot(ATu))
        return sigma_s ** 2 * u + A_fft(Cu).real

    # preconditioner: exact low-res Fourier inverse of the isotropic system
    # (sigma_s^2 + theta_bar * invW)^{-1}, invW = block-mean of |FB|^2
    theta_bar = jnp.mean(theta0_var)
    H, W = F2B.shape[-2:]
    invW = jnp.mean(jnp.asarray(F2B).reshape(sf, H // sf, sf, W // sf)
                    .transpose(1, 3, 0, 2).reshape(H // sf, W // sf, -1),
                    axis=-1)

    def precond(u):
        return offt.ifft2(offt.fft2(u)
                          / (sigma_s ** 2 + theta_bar * invW[..., None])).real

    out = _via_cg(matvec, b, cfg, precond, u0, want_state)
    return (AT_fft(out[0]).real,) + out[1:]


def colorization_mat(op, y, x0_mean, theta0_var, ortho_tf, iso: bool,
                     cfg: GuidanceConfig, *, u0=None, want_state=False):
    """v solver for A = channel mean (an extension: the reference registers
    no mat solver for its ColorizationOperator, so Type I/II guidance is
    unavailable there). A A^T = I/3, so the isotropic solve is closed-form;
    the ortho-diagonal case runs CG in y-space. Returns A^T u (x-space)."""
    sigma_s = jnp.clip(op.sigma_s, min=0.001)
    b = y - op.forward(x0_mean)
    if iso:
        u = b / (sigma_s ** 2 + theta0_var / 3.0)
        # A^T u = repeat(u)/3, x-space like the others
        return _closed(op.transpose(u), u0, want_state)
    ot, iot = ortho_tf, ortho_tf.inv

    def matvec(u):
        ATu = jnp.repeat(u, 3, axis=-1) / 3.0
        Cu = iot(theta0_var * ot(ATu))
        return sigma_s ** 2 * u + jnp.mean(Cu, axis=-1, keepdims=True)

    theta_bar = jnp.mean(theta0_var)

    def precond(u):
        return u / (sigma_s ** 2 + theta_bar / 3.0)

    out = _via_cg(matvec, b, cfg, precond, u0, want_state)
    return (jnp.repeat(out[0], 3, axis=-1) / 3.0,) + out[1:]


def mat_solver(op, y, x0_mean, theta0_var, ortho_tf, iso: bool,
               cfg: GuidanceConfig, *, u0=None, want_state=False):
    """Registry dispatch (static on operator type, ref: condition.py:307-314).

    Every solver returns (mat, rel_resid): the solve result plus the CG
    relative residual |r|/|b| at exit (0.0 on the closed-form paths).
    want_state=True appends {"u": raw CG variable, "iters": count} for the
    warm-start carry (see GuidanceConfig.cg_warm_start); u0 seeds the CG."""
    kw = dict(u0=u0, want_state=want_state)
    name = op.name
    if name == "inpainting":
        return inpainting_mat(op, y, x0_mean, theta0_var, ortho_tf, iso, cfg, **kw)
    if name in ("gaussian_blur", "motion_blur"):
        return deblur_mat(op, y, x0_mean, theta0_var, ortho_tf, iso, cfg, **kw)
    if name == "super_resolution":
        return super_resolution_mat(op, y, x0_mean, theta0_var, ortho_tf, iso, cfg, **kw)
    if name == "colorization":
        return colorization_mat(op, y, x0_mean, theta0_var, ortho_tf, iso, cfg, **kw)
    raise NotImplementedError(f"no mat solver for operator '{name}'")


def init_solver_state(op, x_shape):
    """Zero warm-start state for `cg_warm_start`: a pytree matching the
    solver's raw CG variable for operator `op` on images of shape x_shape
    (NHWC). u lives in x-space for inpainting/deblur, in y-space (low-res)
    for super-resolution, and is single-channel for colorization."""
    import numpy as np  # shapes only; no jax op before dist init
    B, H, W, C = x_shape
    if op.name == "super_resolution":
        sf = op.scale_factor
        u = np.zeros((B, H // sf, W // sf, C), np.float32)
    elif op.name == "colorization":
        u = np.zeros((B, H, W, 1), np.float32)
    else:
        u = np.zeros((B, H, W, C), np.float32)
    return {"u": u, "iters": np.asarray(0, np.int32)}


# ---------------------------------------------------------------------------
# The condition denoiser
# ---------------------------------------------------------------------------

def make_condition_denoiser(uncond_pred: Callable, x0_var_fn: Callable, operator,
                            measurement: Measurement, cfg: GuidanceConfig,
                            params=None, v2: bool = False,
                            with_info: bool = False):
    """Builds `denoise(x, sigma, key) -> hat_x0` implementing all guidance
    modes (ref: ConditionDenoiser.forward, condition.py:83-131).

    `uncond_pred(params, x, sigma) -> (x0_mean, aux)`;
    `x0_var_fn(aux, sigma, x0_mean_vjp, x_shape)` -> x0_var (v1) or
    (x0_var, theta0_var) (v2).

    with_info=True makes denoise return `(hat_x0, info)` where info is a
    dict carrying `cg_resid` — the worst CG relative residual |r|/|b| of
    the likelihood solves inside this call (0.0 for closed-form/solver-free
    modes). Sampler loops max-accumulate it so silent CG truncation is
    observable on hardware without host callbacks (VERDICT r4 #2).
    """
    ortho_tf = OrthoTransform(cfg.ortho_tf_type)
    y = measurement.y
    guidance = cfg.guidance
    # Solver-branch structure per covariance type (matching the reference's
    # theta0_var.numel()==1 dispatch, condition.py:322/356/408):
    #   "iso"     — always scalar => closed form ('pgdm','dps','diffpir', and
    #               'analytic': a per-sigma scalar from the MC table)
    #   "switch"  — tensor below mle_sigma_thres, scalar above ('convert' and
    #               the V2 learned heads): lax.cond picks CG vs closed form
    #   "tensor"  — always tensor => CG ('tmpd')
    iso_kind = {"pgdm": "iso", "dps": "iso", "diffpir": "iso",
                "analytic": "iso", "convert": "switch", "tmpd": "tensor"}

    def _moments_and_vjp(x, sigma):
        pred = lambda xx: uncond_pred(params, xx, sigma)
        if cfg.remat_vjp:
            # See GuidanceConfig.remat_vjp for the measured tradeoff.
            pred = jax.checkpoint(pred, policy=_remat_policy(cfg.remat_vjp))
        (x0_mean, aux), vjp_fn = jax.vjp(pred, x)
        # vjp_fn takes cotangents for (x0_mean, aux); zero the aux cotangent.
        zero_aux = jax.tree.map(jnp.zeros_like, aux)
        mean_vjp = lambda ct: vjp_fn((ct, zero_aux))
        return x0_mean, aux, mean_vjp

    def _variances(aux, sigma, mean_vjp, x_shape):
        if v2:
            x0_var, theta0_var = x0_var_fn(aux, sigma)
        else:
            x0_var = x0_var_fn(aux, sigma, mean_vjp, x_shape)
            theta0_var = x0_var
        return x0_var, theta0_var

    def _solver_var(x0_var, theta0_var):
        # ref: condition.py:170-171 — use theta0_var in ortho basis if set
        return x0_var if cfg.ortho_tf_type is None else theta0_var

    kind = "switch" if v2 else iso_kind[cfg.x0_cov_type]

    def _solve(x0_mean, svar, sigma):
        """Dispatches closed-form vs CG like the reference's numel()==1
        check; for 'switch' covariances the branch is a runtime lax.cond on
        the mle threshold (only one branch executes per step). Returns
        (mat, rel_resid)."""
        if kind == "iso":
            # svar may be a broadcast tensor of a per-image scalar; reduce
            sv = svar if jnp.ndim(svar) == 0 else jnp.mean(svar)
            return mat_solver(operator, y, x0_mean, sv, ortho_tf, True, cfg)
        if kind == "tensor":
            return mat_solver(operator, y, x0_mean, svar, ortho_tf, False, cfg)

        def cg_branch(args):
            x0m, sv = args
            return mat_solver(operator, y, x0m, sv, ortho_tf, False, cfg)

        def closed_branch(args):
            x0m, sv = args
            return mat_solver(operator, y, x0m, mle_var(sigma), ortho_tf,
                              True, cfg)

        return lax.cond(sigma < cfg.mle_sigma_thres, cg_branch, closed_branch,
                        (x0_mean, svar))

    def _solve_ws(x0_mean, svar, sigma, u0):
        """_solve with the warm-start carry: seeds CG with u0 and returns
        (mat, resid, state) where state = {"u", "iters"}. Closed-form
        branches pass u0 through so the lax.cond pytrees match."""
        if kind == "tensor":
            return mat_solver(operator, y, x0_mean, svar, ortho_tf, False,
                              cfg, u0=u0, want_state=True)

        def cg_branch(args):
            x0m, sv, u_in = args
            return mat_solver(operator, y, x0m, sv, ortho_tf, False, cfg,
                              u0=u_in, want_state=True)

        def closed_branch(args):
            x0m, sv, u_in = args
            return mat_solver(operator, y, x0m, mle_var(sigma), ortho_tf,
                              True, cfg, u0=u_in, want_state=True)

        return lax.cond(sigma < cfg.mle_sigma_thres, cg_branch, closed_branch,
                        (x0_mean, svar, u0))

    # --- guidance implementations ---

    def type_I(x, sigma, key):
        """ref: condition.py:167-174"""
        x0_mean, aux, mean_vjp = _moments_and_vjp(x, sigma)
        x0_var, theta0_var = _variances(aux, sigma, mean_vjp, x.shape)
        svar = _solver_var(x0_var, theta0_var)
        mat, resid = _solve(x0_mean, svar, sigma)
        score = mean_vjp(lax.stop_gradient(mat))[0]
        return x0_mean + sigma ** 2 * score, resid

    def type_II(x, sigma, key):
        """ref: condition.py:176-183"""
        # the vjp is only materialized if the covariance needs it (tmpd)
        x0_mean, aux, mean_vjp = _moments_and_vjp(x, sigma)
        x0_var, theta0_var = _variances(aux, sigma, mean_vjp, x.shape)
        svar = _solver_var(x0_var, theta0_var)
        mat, resid = _solve(x0_mean, svar, sigma)
        return x0_mean + ortho_tf.inv(ortho_tf(mat) * svar), resid

    def dps(x, sigma, key):
        """ref: condition.py:140-148"""
        assert cfg.zeta is not None, "DPS guidance requires a zeta step size"
        x0_mean, aux, mean_vjp = _moments_and_vjp(x, sigma)
        fwd, op_vjp = jax.vjp(operator.forward, x0_mean)
        difference = y - fwd
        norm = jnp.linalg.norm(difference.reshape(-1))
        # d(-norm)/d x0_mean = A^T(difference) / norm
        ct = op_vjp(difference / norm)[0]
        score = mean_vjp(ct)[0] * cfg.zeta
        return x0_mean + sigma ** 2 * score, _NO_RESID

    def pgdm(x, sigma, key):
        """ref: condition.py:150-157"""
        x0_mean, aux, mean_vjp = _moments_and_vjp(x, sigma)
        x0_var = mle_var(sigma)
        mat, resid = mat_solver(operator, y, x0_mean, x0_var, ortho_tf, True,
                                cfg)
        score = mean_vjp(lax.stop_gradient(mat))[0] * x0_var
        return x0_mean + sigma ** 2 * score, resid

    def diffpir(x, sigma, key):
        """ref: condition.py:159-165"""
        assert cfg.lambda_ is not None, "lambda_ must be specified for DiffPIR"
        x0_mean, aux = uncond_pred(params, x, sigma)
        x0_var = sigma ** 2 / cfg.lambda_
        mat, resid = mat_solver(operator, y, x0_mean, x0_var, ortho_tf, True,
                                cfg)
        return x0_mean + mat * x0_var, resid

    def stsl(x, sigma, key):
        """ref: condition.py:185-208"""
        assert (cfg.zeta is not None and cfg.eta is not None
                and cfg.num_hutchinson_samples is not None), \
            "zeta, eta, num_hutchinson_samples must be specified for STSL"

        def loss_fn(xx):
            x0_mean, aux = uncond_pred(params, xx, sigma)
            difference = y - operator.forward(x0_mean)
            first_order = -jnp.linalg.norm(difference.reshape(-1))
            second_order = 0.0
            for i in range(cfg.num_hutchinson_samples):
                eps = jax.random.normal(jax.random.fold_in(key, i), xx.shape,
                                        xx.dtype)
                inc_mean, _ = uncond_pred(params, xx + eps, sigma)
                second_order += -jnp.sum((inc_mean - x0_mean) * eps) * sigma ** 2
            second_order /= cfg.num_hutchinson_samples
            loss = cfg.zeta * first_order + (cfg.eta / xx.size) * second_order
            return loss, x0_mean

        grads, x0_mean = jax.grad(loss_fn, has_aux=True)(x)
        return x0_mean + sigma ** 2 * grads, _NO_RESID

    def auto_type_I(x, sigma, key):
        """ref: condition.py:133-138 — gradient of the exact Gaussian
        log-likelihood with matrix-free covariance; see autoi.py."""
        from .autoi import auto_type_I_guidance
        return auto_type_I_guidance(uncond_pred, x0_var_fn, operator, y, cfg,
                                    params, x, sigma, key, ortho_tf, v2=v2)

    def uncond(x, sigma, key):
        return uncond_pred(params, x, sigma)[0], _NO_RESID

    impls = {"uncond": uncond, "I": type_I, "II": type_II, "dps": dps,
             "pgdm": pgdm, "diffpir": diffpir, "stsl": stsl, "autoI": auto_type_I}

    def type_I_ws(x, sigma, key, st):
        """type_I with the CG warm-start carry (GuidanceConfig.cg_warm_start):
        the solve seeds from st["u"] — the previous sampler step's raw CG
        iterate — and returns the new state for the next step."""
        x0_mean, aux, mean_vjp = _moments_and_vjp(x, sigma)
        x0_var, theta0_var = _variances(aux, sigma, mean_vjp, x.shape)
        svar = _solver_var(x0_var, theta0_var)
        mat, resid, state = _solve_ws(x0_mean, svar, sigma, st["u"])
        score = mean_vjp(lax.stop_gradient(mat))[0]
        return x0_mean + sigma ** 2 * score, resid, state

    def type_II_ws(x, sigma, key, st):
        """type_II with the CG warm-start carry (see type_I_ws)."""
        x0_mean, aux, mean_vjp = _moments_and_vjp(x, sigma)
        x0_var, theta0_var = _variances(aux, sigma, mean_vjp, x.shape)
        svar = _solver_var(x0_var, theta0_var)
        mat, resid, state = _solve_ws(x0_mean, svar, sigma, st["u"])
        return x0_mean + ortho_tf.inv(ortho_tf(mat) * svar), resid, state

    def _finish(out, resid):
        out = jnp.clip(out, -1, 1)
        if with_info:
            return out, {"cg_resid": resid}
        return out

    def loglikelihood(x, sigma, key, lanczos_iters: int = 25):
        """Scalar log p(y | x0 moments at (x, sigma)) — the value surface of
        the reference's `ConditionDenoiser.loglikelihood`
        (condition.py:77-81: gpytorch MultivariateNormal.log_prob over the
        lazy likelihood covariance). Evaluated fully on-device by CG (quad
        term) + stochastic Lanczos quadrature (logdet); see
        autoi.measurement_loglikelihood. Returns (ll, cg_rel_resid).
        Diagnostic only: no guidance mode consumes the value (the reference
        too uses only its gradient, taken in closed form in autoi.py)."""
        from .autoi import measurement_loglikelihood
        x0_mean, aux, mean_vjp = _moments_and_vjp(x, sigma)
        x0_var, theta0_var = _variances(aux, sigma, mean_vjp, x.shape)
        svar = _solver_var(x0_var, theta0_var)
        return measurement_loglikelihood(operator, ortho_tf, y, x0_mean,
                                         svar, cfg, key,
                                         lanczos_iters=lanczos_iters)

    if cfg.cg_warm_start:
        assert with_info, "cg_warm_start needs the info-returning denoiser"
        assert guidance in ("I", "II"), (
            f"cg_warm_start applies to guidance I/II (CG solves), "
            f"not {guidance!r}")
        assert kind != "iso", (
            f"covariance {cfg.x0_cov_type!r} is closed-form (no CG); "
            f"cg_warm_start has nothing to warm")
        fn_ws = type_I_ws if guidance == "I" else type_II_ws

        def denoise(x, sigma, key=None, solver_state=None):
            out, resid, state = fn_ws(x, sigma, key, solver_state)
            state = jax.tree.map(lax.stop_gradient, state)
            return jnp.clip(out, -1, 1), {"cg_resid": resid,
                                          "solver_state": state}
        denoise.loglikelihood = loglikelihood
        denoise.init_solver_state = (
            lambda x_shape: init_solver_state(operator, x_shape))
        return denoise

    if guidance in impls:
        fn = impls[guidance]

        def denoise(x, sigma, key=None):
            return _finish(*fn(x, sigma, key))
        denoise.loglikelihood = loglikelihood
        return denoise

    if guidance in ("dps+mle", "pgdm+mle", "stsl+mle"):
        base = impls[guidance.split("+")[0]]

        def denoise(x, sigma, key=None):
            out, resid = lax.cond(sigma < cfg.mle_sigma_thres,
                                  lambda operand: type_I(*operand),
                                  lambda operand: base(*operand),
                                  (x, sigma, key))
            return _finish(out, resid)
        denoise.loglikelihood = loglikelihood
        return denoise

    raise ValueError(f"Invalid guidance type: '{guidance}'.")
