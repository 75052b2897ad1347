"""Golden-value tests for sigma schedules and DDPM tables vs the reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from kdip_tpu import schedules, diffusion


def test_karras_schedule_endpoints():
    s = schedules.get_sigmas_karras(50, 0.01, 80.0, rho=7.0)
    assert s.shape == (51,)
    assert np.isclose(float(s[0]), 80.0, rtol=1e-5)
    assert np.isclose(float(s[-2]), 0.01, rtol=1e-4)
    assert float(s[-1]) == 0.0
    assert np.all(np.diff(np.asarray(s)) < 0)  # strictly decreasing


def test_karras_schedule_vs_reference(reference_path):
    import torch
    from k_diffusion.sampling import get_sigmas_karras as ref_karras
    ref = ref_karras(50, 0.01, 80.0, rho=7.0).numpy()
    ours = np.asarray(schedules.get_sigmas_karras(50, 0.01, 80.0, rho=7.0))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=1e-7)


@pytest.mark.parametrize("name,ours_fn", [
    ("exponential", schedules.get_sigmas_exponential),
    ("polyexponential", schedules.get_sigmas_polyexponential),
])
def test_other_schedules_vs_reference(reference_path, name, ours_fn):
    from k_diffusion import sampling as ref_sampling
    ref_fn = getattr(ref_sampling, f"get_sigmas_{name}")
    ref = ref_fn(32, 0.02, 60.0).numpy()
    ours = np.asarray(ours_fn(32, 0.02, 60.0))
    np.testing.assert_allclose(ours, ref, rtol=3e-5, atol=1e-7)


def test_vp_schedule_vs_reference(reference_path):
    from k_diffusion.sampling import get_sigmas_vp as ref_vp
    ref = ref_vp(32).numpy()
    ours = np.asarray(schedules.get_sigmas_vp(32))
    # fp32 expm1-style cancellation at tiny sigmas: compare loosely there
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=1e-6)
    np.testing.assert_allclose(ours[:16], ref[:16], rtol=1e-4)


def test_ancestral_step_vs_reference(reference_path):
    import torch
    from k_diffusion.sampling import get_ancestral_step as ref_step
    for sf, st, eta in [(1.0, 0.5, 1.0), (2.0, 1.5, 0.7), (0.3, 0.1, 1.0)]:
        rd, ru = ref_step(torch.tensor(sf), torch.tensor(st), eta)
        od, ou = schedules.get_ancestral_step(sf, st, eta)
        np.testing.assert_allclose(float(od), float(rd), rtol=1e-5)
        np.testing.assert_allclose(float(ou), float(ru), rtol=1e-5)


def test_beta_schedule_vs_reference(reference_path):
    from guided_diffusion.gaussian_diffusion import get_named_beta_schedule as ref_betas
    for name in ["linear", "cosine"]:
        np.testing.assert_allclose(
            diffusion.get_named_beta_schedule(name, 1000),
            ref_betas(name, 1000), rtol=1e-12)


def test_tables_vs_reference(reference_path):
    from guided_diffusion.gaussian_diffusion import (
        GaussianDiffusion, ModelMeanType, ModelVarType, LossType)
    betas = diffusion.get_named_beta_schedule("linear", 1000)
    ref = GaussianDiffusion(betas=betas, model_mean_type=ModelMeanType.EPSILON,
                            model_var_type=ModelVarType.LEARNED_RANGE,
                            loss_type=LossType.MSE)
    t = diffusion.make_tables(betas)
    for name in ["alphas_cumprod", "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
                 "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
                 "posterior_variance", "posterior_log_variance_clipped",
                 "posterior_mean_coef1", "posterior_mean_coef2"]:
        np.testing.assert_allclose(np.asarray(getattr(t, name)), getattr(ref, name),
                                   rtol=1e-5, atol=1e-7, err_msg=name)
    # EDM sigmas of the discrete schedule (external.py:93)
    np.testing.assert_allclose(
        np.asarray(t.sigmas), np.sqrt((1 - ref.alphas_cumprod) / ref.alphas_cumprod),
        rtol=1e-5)


def test_spaced_diffusion_vs_reference(reference_path):
    from guided_diffusion.respace import SpacedDiffusion, space_timesteps
    from guided_diffusion.gaussian_diffusion import (
        ModelMeanType, ModelVarType, LossType)
    betas = diffusion.get_named_beta_schedule("linear", 1000)
    ref = SpacedDiffusion(
        use_timesteps=space_timesteps(1000, "250"), betas=betas,
        model_mean_type=ModelMeanType.EPSILON,
        model_var_type=ModelVarType.LEARNED_RANGE, loss_type=LossType.MSE)
    t = diffusion.make_diffusion(1000, "linear", "250")
    assert t.num_timesteps == 250
    np.testing.assert_allclose(np.asarray(t.betas), ref.betas, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(t.timestep_map), np.array(ref.timestep_map))


def test_p_mean_variance_vs_reference(reference_path):
    """End-to-end p_mean_variance parity with a fake eps+var model output."""
    import torch
    from guided_diffusion.gaussian_diffusion import (
        GaussianDiffusion, ModelMeanType, ModelVarType, LossType)
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 8, 8, 3
    x = rng.randn(B, H, W, C).astype(np.float32)
    model_out = rng.randn(B, H, W, 2 * C).astype(np.float32)
    t_idx = np.array([3, 700])

    betas = diffusion.get_named_beta_schedule("linear", 1000)
    ref = GaussianDiffusion(betas=betas, model_mean_type=ModelMeanType.EPSILON,
                            model_var_type=ModelVarType.LEARNED_RANGE,
                            loss_type=LossType.MSE)

    # Reference expects NCHW; model is a closure returning the fixed output.
    x_t = torch.tensor(x.transpose(0, 3, 1, 2))
    out_t = torch.tensor(model_out.transpose(0, 3, 1, 2))
    ref_out = ref.p_mean_variance(lambda *a, **k: out_t, x_t, torch.tensor(t_idx))

    tables = diffusion.make_tables(betas)
    ours = diffusion.p_mean_variance(tables, jnp.asarray(model_out), jnp.asarray(x),
                                     jnp.asarray(t_idx))
    for key in ["mean", "variance", "log_variance", "pred_xstart"]:
        ref_np = ref_out[key].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(ours[key]), ref_np, rtol=2e-4, atol=1e-5,
                                   err_msg=key)


def test_convert_x0_var_vs_reference(reference_path):
    """Eq.(22) Convert covariance parity (condition/condition.py:241-248)."""
    import torch
    from guided_diffusion.gaussian_diffusion import (
        GaussianDiffusion, ModelMeanType, ModelVarType, LossType, _extract_into_tensor)
    betas = diffusion.get_named_beta_schedule("linear", 1000)
    ref = GaussianDiffusion(betas=betas, model_mean_type=ModelMeanType.EPSILON,
                            model_var_type=ModelVarType.LEARNED_RANGE,
                            loss_type=LossType.MSE)
    rng = np.random.RandomState(1)
    variance = np.abs(rng.randn(1, 4, 4, 3)).astype(np.float32) * 1e-3
    t_idx = np.array([42])
    var_t = torch.tensor(variance.transpose(0, 3, 1, 2))
    shape = var_t.shape
    ref_var = ((var_t - _extract_into_tensor(ref.posterior_variance, torch.tensor(t_idx), shape))
               / _extract_into_tensor(ref.posterior_mean_coef1, torch.tensor(t_idx), shape).pow(2)
               ).clip(min=1e-6)
    tables = diffusion.make_tables(betas)
    ours = diffusion.convert_x0_var(tables, jnp.asarray(variance), jnp.asarray(t_idx))
    np.testing.assert_allclose(np.asarray(ours), ref_var.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-4, atol=1e-8)
