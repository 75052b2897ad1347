"""autoI guidance validation against a dense-matrix oracle.

The matrix-free implementation (CG solves + Hutchinson trace probes,
kdip_tpu/autoi.py) must match the exact gradient of
log N(y; A x0_mean(x), sigma_s^2 I + A W diag(v(x)) W^T A^T) computed by
autodiff through an explicitly materialized covariance matrix on a small
problem. This is the oracle gpytorch provides for the reference
(condition.py:18-38, 77-81, 133-138).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import diffusion, guidance
from kdip_tpu import operators as kops
from kdip_tpu.models import adm
from kdip_tpu.ops.transforms import OrthoTransform

SIZE = 8


@pytest.fixture(scope="module")
def setup():
    model = adm.ADMUNet(image_size=SIZE, model_channels=32, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_heads=2, num_head_channels=16, out_channels=6)
    params = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)),
                        jnp.zeros((1,)))["params"]
    tables = diffusion.make_diffusion(1000, "linear")

    def model_apply(p, x, t):
        return model.apply({"params": p}, x, t.astype(jnp.float32))

    mask = kops.generate_mask(mask_type="random", mask_prob_range=(0.4, 0.4),
                              image_size=SIZE, seed=0)
    op = kops.InpaintingOperator(sigma_s=jnp.float32(0.05),
                                 mask=jnp.asarray(mask))
    x0 = jax.random.uniform(jax.random.key(1), (1, SIZE, SIZE, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(2))
    return model_apply, params, tables, op, meas


def _dense_oracle_grad(model_apply, params, tables, op, meas, cfg, x, sigma):
    """Exact grad of the Gaussian log-likelihood via a dense covariance."""
    ortho_tf = OrthoTransform(cfg.ortho_tf_type)
    uncond, var_fn = guidance.make_openai_uncond(model_apply, tables, cfg)
    n = x.size
    sigma_s = jnp.clip(op.sigma_s, min=0.001)

    # dense W diag(v) W^T: columns are W e_i scaled
    def cov_dense(v):
        eye = jnp.eye(n).reshape(n, *x.shape[1:])
        # ortho_tf.inv(v * ortho_tf(e_i)) for each basis vector (vmapped)
        cols = jax.vmap(lambda e: ortho_tf.inv(v[0] * ortho_tf(e[None]))[0])(eye)
        return cols.reshape(n, n).T

    def loglik(xx):
        x0_mean, aux = uncond_pred_cached(xx)
        v = var_fn(aux, sigma, None, xx.shape)
        v = jnp.broadcast_to(v, xx.shape)
        mu = op.forward(x0_mean).reshape(-1)
        A = jnp.asarray(np.diag(np.asarray(op.mask).reshape(-1)))
        K = sigma_s ** 2 * jnp.eye(n) + A @ cov_dense(v) @ A.T
        r = meas.y.reshape(-1) - mu
        sol = jnp.linalg.solve(K, r)
        _, logdet = jnp.linalg.slogdet(K)
        return -0.5 * (r @ sol) - 0.5 * logdet

    def uncond_pred_cached(xx):
        return uncond(params, xx, sigma)

    return jax.grad(loglik)(x)


def test_autoi_matches_dense_oracle(setup):
    model_apply, params, tables, op, meas = setup
    # many probes to shrink the Hutchinson variance; convert covariance below
    # the mle threshold so v depends on x (exercises the J_v^T term)
    cfg = guidance.GuidanceConfig(guidance="autoI", x0_cov_type="convert",
                                  mle_sigma_thres=0.5, num_probes=128,
                                  cg_maxiter=400, cg_tol=1e-6)
    sigma = jnp.float32(0.1)
    x = jax.random.normal(jax.random.key(3), (1, SIZE, SIZE, 3)) * 0.1

    oracle = _dense_oracle_grad(model_apply, params, tables, op, meas, cfg,
                                x, sigma)

    from kdip_tpu.autoi import auto_type_I_guidance
    uncond, var_fn = guidance.make_openai_uncond(model_apply, tables, cfg)
    ortho_tf = OrthoTransform(cfg.ortho_tf_type)
    hat_x0, cg_resid = auto_type_I_guidance(uncond, var_fn, op, meas.y, cfg,
                                            params, x, sigma,
                                            jax.random.key(4), ortho_tf)
    assert float(cg_resid) < 1e-4  # every K^{-1} solve converged
    x0_mean, _ = uncond(params, x, sigma)
    score = (hat_x0 - x0_mean) / sigma ** 2

    o = np.asarray(oracle).ravel()
    s = np.asarray(score).ravel()
    # cosine similarity + relative error (stochastic trace term leaves a few
    # percent noise even at 256 probes)
    cos = float(np.dot(o, s) / (np.linalg.norm(o) * np.linalg.norm(s)))
    rel = float(np.linalg.norm(o - s) / np.linalg.norm(o))
    print(f"autoI vs dense oracle: cos={cos:.5f} rel_err={rel:.4f}")
    assert cos > 0.99
    assert rel < 0.15


def test_autoi_matches_dense_oracle_dct(setup):
    """Same check in the DCT ortho basis."""
    model_apply, params, tables, op, meas = setup
    cfg = guidance.GuidanceConfig(guidance="autoI", x0_cov_type="convert",
                                  mle_sigma_thres=0.5, num_probes=128,
                                  cg_maxiter=400, cg_tol=1e-6,
                                  ortho_tf_type="dct")
    sigma = jnp.float32(0.1)
    x = jax.random.normal(jax.random.key(5), (1, SIZE, SIZE, 3)) * 0.1

    oracle = _dense_oracle_grad(model_apply, params, tables, op, meas, cfg,
                                x, sigma)

    from kdip_tpu.autoi import auto_type_I_guidance
    uncond, var_fn = guidance.make_openai_uncond(model_apply, tables, cfg)
    ortho_tf = OrthoTransform(cfg.ortho_tf_type)
    hat_x0, cg_resid = auto_type_I_guidance(uncond, var_fn, op, meas.y, cfg,
                                            params, x, sigma,
                                            jax.random.key(6), ortho_tf)
    assert float(cg_resid) < 1e-4  # every K^{-1} solve converged
    x0_mean, _ = uncond(params, x, sigma)
    score = (hat_x0 - x0_mean) / sigma ** 2

    o = np.asarray(oracle).ravel()
    s = np.asarray(score).ravel()
    cos = float(np.dot(o, s) / (np.linalg.norm(o) * np.linalg.norm(s)))
    rel = float(np.linalg.norm(o - s) / np.linalg.norm(o))
    print(f"autoI(dct) vs dense oracle: cos={cos:.5f} rel_err={rel:.4f}")
    assert cos > 0.99
    assert rel < 0.15
