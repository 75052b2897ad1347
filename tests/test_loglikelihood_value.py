"""The autoI log-likelihood VALUE surface (VERDICT r4 Missing #4).

The reference's `ConditionDenoiser.loglikelihood` (condition.py:77-81)
returns the scalar log N(y; A x0_mean, K) evaluated by gpytorch's
CG + stochastic-Lanczos machinery; guidance consumes only its gradient,
which both repos compute separately. These tests pin our on-device
equivalent (`autoi.slq_logdet` / `autoi.measurement_loglikelihood` /
`denoise.loglikelihood`) against dense closed forms on problems small
enough to materialize K.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kdip_tpu import guidance
from kdip_tpu import operators as kops
from kdip_tpu.autoi import measurement_loglikelihood, slq_logdet
from kdip_tpu.ops.transforms import OrthoTransform

SIZE = 8


def _dense_from_matvec(matvec, d, shape, dtype=jnp.float32):
    eye = jnp.eye(d, dtype=dtype)
    cols = jax.vmap(lambda e: matvec(e.reshape(shape)).reshape(-1))(eye)
    return np.asarray(cols).T


@pytest.fixture(scope="module")
def inpaint_problem():
    op = kops.get_operator("inpainting", sigma_s=0.05,
                           mask_opt=dict(mask_type="random",
                                         mask_prob_range=(0.5, 0.5),
                                         image_size=SIZE), seed=0)
    x0 = jax.random.uniform(jax.random.key(1), (1, SIZE, SIZE, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(2))
    svar = 0.05 + jax.random.uniform(jax.random.key(3),
                                     (1, SIZE, SIZE, 3))
    x0_mean = jax.random.uniform(jax.random.key(4),
                                 (1, SIZE, SIZE, 3)) * 2 - 1
    return op, meas, x0_mean, svar


def test_slq_logdet_exact_on_scaled_identity():
    """For K = c*I every Rademacher probe integrates exactly: the estimate
    equals d*log(c) with zero variance."""
    c = 3.7
    x = jnp.zeros((4, 5))
    est = slq_logdet(lambda u: c * u, x, jax.random.key(0),
                     num_probes=2, lanczos_iters=4)
    np.testing.assert_allclose(float(est), x.size * np.log(c), rtol=1e-5)


def test_slq_logdet_matches_dense_psd():
    d = 64
    key = jax.random.key(7)
    B = jax.random.normal(key, (d, d)) / np.sqrt(d)
    K = B @ B.T + 0.5 * jnp.eye(d)
    exact = float(jnp.linalg.slogdet(K)[1])
    # a dense random K is the Hutchinson worst case (large off-diagonal
    # energy), so this needs many probes; the measurement covariances the
    # production path sees are near-diagonal and converge far faster
    est = float(slq_logdet(lambda u: K @ u, jnp.zeros(d), jax.random.key(1),
                           num_probes=512, lanczos_iters=32))
    assert abs(est - exact) / abs(exact) < 0.02, (est, exact)


def test_measurement_loglikelihood_matches_dense(inpaint_problem):
    """On a problem small enough to materialize K, the CG+SLQ value must
    agree with the exact multivariate-normal log-density."""
    op, meas, x0_mean, svar = inpaint_problem
    ot = OrthoTransform(None)
    cfg = guidance.GuidanceConfig(cg_tol=1e-8)

    sigma_s = max(float(op.sigma_s), 1e-3)
    v = svar

    def K_mv(u):
        return sigma_s ** 2 * u + op.forward(v * op.transpose(u))

    y = meas.y
    d = y.size
    K = _dense_from_matvec(K_mv, d, y.shape)
    r = np.asarray(y - op.forward(x0_mean)).reshape(-1)
    sign, logdet = np.linalg.slogdet(K)
    assert sign > 0
    exact = -0.5 * (r @ np.linalg.solve(K, r) + logdet
                    + d * np.log(2 * np.pi))

    ll, resid = measurement_loglikelihood(op, ot, y, x0_mean, svar, cfg,
                                          jax.random.key(5),
                                          lanczos_iters=30)
    assert float(resid) <= cfg.cg_tol
    assert abs(float(ll) - exact) / abs(exact) < 0.05, (float(ll), exact)


def test_measurement_loglikelihood_jits(inpaint_problem):
    op, meas, x0_mean, svar = inpaint_problem
    ot = OrthoTransform(None)
    cfg = guidance.GuidanceConfig()
    f = jax.jit(lambda m, k: measurement_loglikelihood(
        op, ot, meas.y, m, svar, cfg, k))
    ll, resid = f(x0_mean, jax.random.key(6))
    assert np.isfinite(float(ll))
    assert float(resid) <= cfg.cg_tol


def test_denoiser_exposes_loglikelihood(inpaint_problem):
    """`make_condition_denoiser(...)` carries a `.loglikelihood(x, sigma,
    key)` method — the reference's diagnostic surface — for every guidance
    mode, computed from the same moments the guidance uses."""
    op, meas, _, _ = inpaint_problem
    from kdip_tpu.models import adm

    model = adm.ADMUNet(image_size=SIZE, model_channels=32, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_heads=2, num_head_channels=16, out_channels=6)
    params = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)),
                        jnp.zeros((1,)))["params"]

    from kdip_tpu import diffusion
    tables = diffusion.make_diffusion(1000, "linear")

    def model_apply(p, x, t):
        return model.apply({"params": p}, x,
                           jnp.broadcast_to(t, (x.shape[0],)).astype(
                               jnp.float32))

    for mode in ("autoI", "I", "dps+mle"):
        cfg = guidance.GuidanceConfig(guidance=mode, x0_cov_type="convert",
                                      zeta=1.0)
        uncond_pred, x0_var_fn = guidance.make_openai_uncond(
            model_apply, tables, cfg)
        den = guidance.make_condition_denoiser(
            uncond_pred, x0_var_fn, op, meas, cfg, params=params)
        x = jax.random.normal(jax.random.key(8), (1, SIZE, SIZE, 3))
        ll, resid = jax.jit(den.loglikelihood)(x, jnp.float32(0.1),
                                               jax.random.key(9))
        assert np.isfinite(float(ll)), mode
        assert float(resid) <= cfg.cg_tol
