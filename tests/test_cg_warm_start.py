"""CG warm-start carry (GuidanceConfig.cg_warm_start).

An extension over the reference: scipy's cg always starts from zero
(condition.py:343); warm-starting each likelihood solve from the previous
sampler step's iterate keeps the same tol*|b| stopping rule (so results
agree within solver tolerance) while cutting the iteration count — the
dominant cost of the tmpd covariance workload (bench.py gaussian_deblur_tmpd).
These tests pin: (1) output parity with the cold path, (2) the iteration
saving actually happens, (3) the per-sample-map variant, (4) misuse asserts.
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
def blur_setup():
    op = kops.get_operator("gaussian_blur", in_shape=(1, 3, SIZE, SIZE),
                           kernel_size=7, intensity=1.5, sigma_s=0.05, seed=0)
    x0 = jax.random.uniform(jax.random.key(1), (1, SIZE, SIZE, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(2))
    return op, meas


def _sample(model_apply, params, op, meas, gcfg, scfg, n=1, **kw):
    tables = diffusion.make_diffusion(1000, "linear")
    sampler = sampling_api.build_posterior_sampler(
        model_apply, tables, op, gcfg, scfg, image_size=SIZE)
    return jax.jit(lambda p, m, k: sampler(p, m, k, n=n, **kw))(
        params, meas, jax.random.key(3))


def test_cg_accepts_x0_and_reports_iters():
    """Warm-starting at the exact solution converges immediately; the
    iteration count is returned with want_iters."""
    diag = jnp.linspace(0.5, 4.0, 64)
    b = jnp.ones(64)
    cfg = guidance.GuidanceConfig(cg_tol=1e-5)
    x, resid, k_cold = guidance._cg(lambda v: diag * v, b, cfg,
                                    want_iters=True)
    assert int(k_cold) > 0 and float(resid) <= 1e-5
    x2, resid2, k_warm = guidance._cg(lambda v: diag * v, b, cfg, x0=x,
                                      want_iters=True)
    assert int(k_warm) == 0, "exact seed must skip the loop entirely"
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-6)


def test_warm_start_matches_cold_trajectory(tiny_model, blur_setup):
    """Both runs converge every solve to tol*|b|, so the reconstructions
    must agree within solver-tolerance effects — warm-start changes the
    iterate path, never the solution."""
    model_apply, params = tiny_model
    op, meas = blur_setup
    scfg = sampling_api.SamplerConfig(steps=3)
    cold_cfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="tmpd")
    warm_cfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="tmpd",
                                       cg_warm_start=True)
    cold = _sample(model_apply, params, op, meas, cold_cfg, scfg)
    warm, info = _sample(model_apply, params, op, meas, warm_cfg, scfg,
                         return_info=True)
    assert float(info["cg_max_residual"]) <= warm_cfg.cg_tol
    assert int(info["cg_total_iters"]) > 0
    np.testing.assert_allclose(np.asarray(warm), np.asarray(cold),
                               atol=5e-2, rtol=0)


def test_warm_start_saves_iterations(tiny_model, blur_setup):
    """The point of the carry: replayed over the SAME (x, sigma) call
    sequence, seeded solves must never iterate more than zero-seeded ones,
    and must iterate strictly less in total (scripts/ab_cg_warm_start.py
    measures the saving at scale; this pins the direction)."""
    model_apply, params = tiny_model
    op, meas = blur_setup
    steps = 6
    warm_cfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="tmpd",
                                       cg_warm_start=True)
    tables = diffusion.make_diffusion(1000, "linear")
    uncond, var_fn = guidance.make_openai_uncond(model_apply, tables, warm_cfg)
    denoise = guidance.make_condition_denoiser(
        uncond, var_fn, op, meas, warm_cfg, params=params, with_info=True)
    jitted = jax.jit(lambda x, s, st: denoise(x, s, None, solver_state=st))
    st0 = jax.tree.map(jnp.asarray,
                       guidance.init_solver_state(op, (1, SIZE, SIZE, 3)))
    from kdip_tpu import schedules
    sigmas = schedules.get_sigmas_karras(steps, 1e-2, 80.0, 7.0)

    # cold pass: zero-seeded solves, record the trajectory
    x = jax.random.normal(jax.random.key(9), (1, SIZE, SIZE, 3)) * 80.0
    traj, cold_iters = [], []
    for i in range(steps):
        traj.append((x, sigmas[i]))
        out, inf = jitted(x, sigmas[i], st0)
        cold_iters.append(int(inf["solver_state"]["iters"]))
        x = x + (x - out) / sigmas[i] * (sigmas[i + 1] - sigmas[i])

    # warm pass: identical call points, state carried between them
    st, warm_iters = st0, []
    for x_i, sigma_i in traj:
        _, inf = jitted(x_i, sigma_i, st)
        st = inf["solver_state"]
        warm_iters.append(int(st["iters"]))

    assert sum(cold_iters) > 0
    assert warm_iters[0] == cold_iters[0], "first call has nothing to warm"
    # per-call: a warm seed is not *guaranteed* never to cost an extra
    # iteration or two, but must never be materially worse
    assert all(w <= c + 2 for w, c in zip(warm_iters, cold_iters)), (
        warm_iters, cold_iters)
    assert sum(warm_iters) < sum(cold_iters), (warm_iters, cold_iters)


def test_warm_start_per_sample_map(tiny_model, blur_setup):
    model_apply, params = tiny_model
    op, meas = blur_setup
    warm_cfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="tmpd",
                                       cg_warm_start=True)
    scfg = sampling_api.SamplerConfig(steps=2, per_sample_map=True)
    out, info = _sample(model_apply, params, op, meas, warm_cfg, scfg, n=3,
                        return_info=True)
    assert out.shape == (3, SIZE, SIZE, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert float(info["cg_max_residual"]) <= warm_cfg.cg_tol
    assert int(info["cg_total_iters"]) > 0


def test_warm_start_without_info_returns_samples_only(tiny_model, blur_setup):
    model_apply, params = tiny_model
    op, meas = blur_setup
    warm_cfg = guidance.GuidanceConfig(guidance="I", x0_cov_type="tmpd",
                                       cg_warm_start=True)
    scfg = sampling_api.SamplerConfig(steps=2)
    out = _sample(model_apply, params, op, meas, warm_cfg, scfg)
    assert out.shape == (1, SIZE, SIZE, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_warm_start_misuse_asserts(blur_setup):
    op, meas = blur_setup
    cfg_iso = guidance.GuidanceConfig(guidance="I", x0_cov_type="pgdm",
                                      cg_warm_start=True)
    with pytest.raises(AssertionError):
        guidance.make_condition_denoiser(lambda *a: None, lambda *a: None,
                                         op, meas, cfg_iso, with_info=True)
    cfg_dps = guidance.GuidanceConfig(guidance="dps", zeta=1.0,
                                      cg_warm_start=True)
    with pytest.raises(AssertionError):
        guidance.make_condition_denoiser(lambda *a: None, lambda *a: None,
                                         op, meas, cfg_dps, with_info=True)


def test_solver_state_shapes():
    # 32px: the default bicubic PSF (17x17 at sf=4) must fit the image
    op_sr = kops.get_operator("super_resolution",
                              in_shape=(1, 3, 32, 32), scale_factor=4,
                              sigma_s=0.05)
    st = guidance.init_solver_state(op_sr, (2, 32, 32, 3))
    assert st["u"].shape == (2, 8, 8, 3)
    op_col = kops.get_operator("colorization", sigma_s=0.05)
    st = guidance.init_solver_state(op_col, (2, SIZE, SIZE, 3))
    assert st["u"].shape == (2, SIZE, SIZE, 1)
