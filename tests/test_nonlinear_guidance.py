"""Guided sampling with NONLINEAR operators (phase retrieval) through DPS and
STSL — a capability the reference's ConditionDenoiser cannot reach (its
__init__ looks up __MAT_SOLVER__[operator.name], condition.py:71, which has
no phase_retrieval entry, so construction raises KeyError). Our guidance
builds the mat solver lazily per mode, so vjp-based modes (dps, stsl) work
with any differentiable forward operator."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import diffusion, guidance, samplers, schedules
from kdip_tpu import operators as kops
from kdip_tpu.models import adm

SIZE = 16


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

    return model_apply, params, tables


@pytest.mark.parametrize("mode,extra", [
    ("dps", dict(zeta=0.3)),
    ("stsl", dict(zeta=0.3, eta=0.5, num_hutchinson_samples=1)),
])
def test_phase_retrieval_guided_sampling(setup, mode, extra):
    model_apply, params, tables = setup
    op = kops.PhaseRetrievalOperator(pad=4, sigma_s=jnp.float32(0.05))
    x0 = jax.random.uniform(jax.random.key(1), (1, SIZE, SIZE, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(2))

    cfg = guidance.GuidanceConfig(guidance=mode, x0_cov_type="dps", **extra)
    uncond, var_fn = guidance.make_openai_uncond(model_apply, tables, cfg)
    denoise = guidance.make_condition_denoiser(uncond, var_fn, op, meas, cfg,
                                               params=params)
    sigmas = schedules.get_sigmas_karras(3, 0.01, 80.0)
    out = samplers.sample_euler(lambda x, s, k: denoise(x, s, k),
                                jax.random.normal(jax.random.key(3),
                                                  (1, SIZE, SIZE, 3)) * 80.0,
                                sigmas, jax.random.key(4))
    out = np.asarray(out)
    assert np.isfinite(out).all()
    assert np.abs(out).max() <= 1.0 + 1e-5
