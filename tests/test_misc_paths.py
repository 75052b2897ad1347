"""Coverage for remaining paths: LPIPS architecture, nonlinear-operator DPS
guidance, CLIP extractor gating, evaluation streaming."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import diffusion, evaluation, guidance, metrics
from kdip_tpu import operators as kops
from kdip_tpu.models import adm


def _random_lpips_params(key):
    """Random-weight LPIPS params with the right shapes (VGG16 conv torso)."""
    params = {}
    cfg = metrics._VGG16_CFG
    keys = jax.random.split(key, 32)
    conv_idx = 0
    c_in = 3
    ki = 0
    for c in cfg:
        if c == "M":
            continue
        params[f"conv{conv_idx}"] = {
            "kernel": jax.random.normal(keys[ki], (3, 3, c_in, c)) * 0.05,
            "bias": jnp.zeros((c,)),
        }
        c_in = c
        conv_idx += 1
        ki += 1
    tap_channels = [64, 128, 256, 512, 512]
    for i, tc in enumerate(tap_channels):
        params[f"lin{i}"] = {"kernel": jnp.abs(
            jax.random.normal(keys[ki], (tc,))) * 0.01}
        ki += 1
    return params


def test_lpips_architecture_properties():
    params = _random_lpips_params(jax.random.key(0))
    a = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    b = jax.random.uniform(jax.random.key(2), (2, 64, 64, 3))
    d_ab = metrics.lpips_vgg(params, a, b)
    d_aa = metrics.lpips_vgg(params, a, a)
    assert d_ab.shape == (2,)
    # identity distance is zero; distinct images are positive
    np.testing.assert_allclose(np.asarray(d_aa), 0.0, atol=1e-6)
    assert float(d_ab.min()) > 0
    # symmetric
    d_ba = metrics.lpips_vgg(params, b, a)
    np.testing.assert_allclose(np.asarray(d_ab), np.asarray(d_ba), rtol=1e-4)


def test_dps_guidance_nonlinear_phase_retrieval():
    """DPS guidance through a nonlinear operator (|F(pad(x))|) — the
    reference supports this via autograd (measurements.py:330-339 +
    condition.py:140-148); here via jax.vjp on operator.forward."""
    tables = diffusion.make_diffusion(1000, "linear")
    model = adm.ADMUNet(image_size=32, model_channels=32, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_heads=2, num_head_channels=16, out_channels=6)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1,)))["params"]
    op = kops.get_operator("phase_retrieval", oversample=1.0, sigma_s=0.05)
    x0 = jax.random.uniform(jax.random.key(1), (1, 32, 32, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(2))
    cfg = guidance.GuidanceConfig(guidance="dps", x0_cov_type="dps", zeta=0.5)

    def model_apply(p, x, t):
        return model.apply({"params": p}, x, t.astype(jnp.float32))

    uncond, var_fn = guidance.make_openai_uncond(model_apply, tables, cfg)
    denoise = guidance.make_condition_denoiser(uncond, var_fn, op, meas, cfg,
                                               params=params)
    out = jax.jit(denoise)(jax.random.normal(jax.random.key(3), (1, 32, 32, 3)),
                           jnp.float32(1.0), jax.random.key(4))
    assert bool(jnp.isfinite(out).all())


def test_colorization_type_I_guidance():
    """Type-I guidance through the colorization operator (extension beyond
    the reference, which registers no mat solver for it). Validates the CG
    branch against the closed-form on an isotropic system."""
    op = kops.get_operator("colorization", sigma_s=0.05)
    x0 = jax.random.uniform(jax.random.key(0), (1, 16, 16, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(1))
    x0_mean = jax.random.uniform(jax.random.key(2), (1, 16, 16, 3)) * 2 - 1
    from kdip_tpu.guidance import GuidanceConfig, colorization_mat
    from kdip_tpu.ops.transforms import OrthoTransform
    cfg = GuidanceConfig(cg_maxiter=200, cg_tol=1e-6)
    ot = OrthoTransform(None)
    theta = jnp.float32(0.02)
    closed, _ = colorization_mat(op, meas.y, x0_mean, theta, ot, True, cfg)
    # CG with a constant tensor variance must match the closed form
    theta_t = jnp.full((1, 16, 16, 3), 0.02)
    via_cg, resid = colorization_mat(op, meas.y, x0_mean, theta_t, ot,
                                     False, cfg)
    np.testing.assert_allclose(np.asarray(via_cg), np.asarray(closed),
                               rtol=1e-3, atol=1e-5)
    assert float(resid) <= cfg.cg_tol  # the solve converged and says so


def test_compute_features_streaming():
    def sample_fn(key, n):
        return jax.random.normal(key, (n, 8))

    feats = evaluation.compute_features(sample_fn, lambda b: b * 2.0, n=10,
                                        batch_size=4, key=jax.random.key(0))
    assert feats.shape == (10, 8)


def test_fid_known_gaussians():
    """FID between N(0,I) and N(mu,I) samples approaches ||mu||^2."""
    k1, k2 = jax.random.split(jax.random.key(0))
    x = jax.random.normal(k1, (4000, 8))
    y = jax.random.normal(k2, (4000, 8)) + jnp.array([1.0] + [0.0] * 7)
    f = float(evaluation.fid(x, y))
    assert 0.8 < f < 1.3
    np.testing.assert_allclose(float(evaluation.fid(x, x)), 0.0, atol=1e-3)
