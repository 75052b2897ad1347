"""CG convergence surfacing (VERDICT r4 #2).

The reference warns via scipy when a CG solve exits unconverged
(condition.py:344-345); on TPU plugins without host callbacks that warning
cannot print, so the residual is instead *returned* — from `_cg` through the
mat solvers, the guidance modes, and the sampler scan — as
`info["cg_max_residual"]`, the worst relative residual |r|/|b| over every
likelihood solve in a trajectory. These tests pin that plumbing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kdip_tpu import diffusion, guidance, sampling_api
from kdip_tpu import operators as kops
from kdip_tpu.models import adm

SIZE = 16


@pytest.fixture(scope="module")
def tiny_model():
    model = adm.ADMUNet(image_size=SIZE, model_channels=32, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_heads=2, num_head_channels=16, out_channels=6)
    params = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)),
                        jnp.zeros((1,)))["params"]

    def model_apply(p, x, t):
        return model.apply({"params": p}, x,
                           jnp.broadcast_to(t, (x.shape[0],)).astype(
                               jnp.float32))

    return model_apply, params


@pytest.fixture(scope="module")
def inpaint_setup():
    op = kops.get_operator("inpainting", sigma_s=0.05,
                           mask_opt=dict(mask_type="random",
                                         mask_prob_range=(0.5, 0.5),
                                         image_size=SIZE), seed=0)
    x0 = jax.random.uniform(jax.random.key(1), (1, SIZE, SIZE, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(2))
    return op, meas


def _sample(model_apply, params, op, meas, gcfg, scfg, n=1, **kw):
    tables = diffusion.make_diffusion(1000, "linear")
    sampler = sampling_api.build_posterior_sampler(
        model_apply, tables, op, gcfg, scfg, image_size=SIZE)
    return jax.jit(lambda p, m, k: sampler(p, m, k, n=n, **kw))(
        params, meas, jax.random.key(3))


def test_cg_returns_relative_residual():
    """_cg reports |r|/|b| at exit: <= tol when converged, > tol when the
    budget truncates the solve."""
    diag = jnp.concatenate([jnp.ones(50) * 1e-3, jnp.ones(50) * 1e3])
    b = jnp.ones(100)
    cfg = guidance.GuidanceConfig(cg_maxiter=500, cg_tol=1e-6)
    x, resid = guidance._cg(lambda v: diag * v, b, cfg)
    assert float(resid) <= 1e-6
    np.testing.assert_allclose(np.asarray(diag * x), np.asarray(b), rtol=1e-4)

    cfg = guidance.GuidanceConfig(cg_maxiter=2, cg_tol=1e-6)
    _, resid = guidance._cg(lambda v: diag * v, b, cfg)
    assert float(resid) > 1e-6


def test_default_budget_matches_reference():
    """cg_maxiter=None resolves to the reference's scipy budget
    (condition.py:343)."""
    assert guidance.resolved_cg_maxiter(guidance.GuidanceConfig()) == 1000
    assert guidance.resolved_cg_maxiter(
        guidance.GuidanceConfig(cg_maxiter=7)) == 7


def test_mat_solver_residual_zero_on_closed_form(inpaint_setup):
    op, meas = inpaint_setup
    cfg = guidance.GuidanceConfig()
    x0_mean = jnp.zeros((1, SIZE, SIZE, 3))
    from kdip_tpu.ops.transforms import OrthoTransform
    _, resid = guidance.mat_solver(op, meas.y, x0_mean, jnp.float32(0.01),
                                   OrthoTransform(None), True, cfg)
    assert float(resid) == 0.0


def test_sampler_info_reports_converged_run(tiny_model, inpaint_setup):
    model_apply, params = tiny_model
    op, meas = inpaint_setup
    gcfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="convert")
    scfg = sampling_api.SamplerConfig(steps=3)
    out, info = _sample(model_apply, params, op, meas, gcfg, scfg,
                        return_info=True)
    assert np.isfinite(np.asarray(out)).all()
    resid = float(info["cg_max_residual"])
    assert 0.0 <= resid <= gcfg.cg_tol, resid


def test_sampler_info_reports_truncation(tiny_model, inpaint_setup):
    """A starved iteration budget must be VISIBLE in the returned info —
    this is the exact failure the compiled-out debug warning used to hide
    on the real chip."""
    model_apply, params = tiny_model
    op, meas = inpaint_setup
    gcfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="convert",
                                   cg_maxiter=1, cg_tol=1e-12, cg_warn=False)
    scfg = sampling_api.SamplerConfig(steps=3)
    _, info = _sample(model_apply, params, op, meas, gcfg, scfg,
                      return_info=True)
    assert float(info["cg_max_residual"]) > 1e-12


def test_info_path_does_not_perturb_samples(tiny_model, inpaint_setup):
    """return_info threads a residual through the scan carry; the samples
    must be bit-identical with and without it."""
    model_apply, params = tiny_model
    op, meas = inpaint_setup
    gcfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="convert")
    scfg = sampling_api.SamplerConfig(steps=3)
    plain = _sample(model_apply, params, op, meas, gcfg, scfg, n=2)
    with_info, _ = _sample(model_apply, params, op, meas, gcfg, scfg, n=2,
                           return_info=True)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(with_info))


def test_per_sample_map_info(tiny_model, inpaint_setup):
    model_apply, params = tiny_model
    op, meas = inpaint_setup
    gcfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="convert")
    scfg = sampling_api.SamplerConfig(steps=3, per_sample_map=True)
    out, info = _sample(model_apply, params, op, meas, gcfg, scfg, n=4,
                        return_info=True)
    assert out.shape == (4, SIZE, SIZE, 3)
    assert float(info["cg_max_residual"]) <= gcfg.cg_tol
