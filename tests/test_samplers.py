"""Sampler trajectory parity vs the reference with a shared analytic denoiser.

The denoiser D(x, sigma) = x / (1 + sigma^2) is the exact posterior mean for
a standard-normal data distribution, so both implementations integrate the
same ODE/SDE; with churn/noise disabled the trajectories must agree to fp32
tolerance step-for-step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import samplers, schedules


def analytic_denoise(x, sigma, key=None):
    return x / (1 + sigma ** 2)


def torch_denoise(x, sigma, **kw):
    return x / (1 + sigma.reshape(-1, *([1] * (x.ndim - 1))) ** 2)


SHAPE = (2, 8, 8, 3)


def _run_pair(reference_path, our_fn, ref_name, n_steps=12, our_kwargs=None,
              ref_kwargs=None, **kwargs):
    import torch
    from k_diffusion import sampling as ref_sampling

    rng = np.random.RandomState(0)
    x0 = (rng.randn(*SHAPE) * 80.0).astype(np.float32)
    sigmas = schedules.get_sigmas_karras(n_steps, 0.05, 80.0)

    ours = our_fn(analytic_denoise, jnp.asarray(x0), sigmas, jax.random.key(0),
                  **kwargs, **(our_kwargs or {}))

    ref_fn = getattr(ref_sampling, ref_name)
    ref = ref_fn(torch_denoise, torch.tensor(x0), torch.tensor(np.asarray(sigmas)),
                 disable=True, **kwargs, **(ref_kwargs or {}))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-3, atol=1e-4)


def test_euler_vs_reference(reference_path):
    _run_pair(reference_path, samplers.sample_euler, "sample_euler")


def test_heun_vs_reference(reference_path):
    _run_pair(reference_path, samplers.sample_heun, "sample_heun")


def test_dpm_2_vs_reference(reference_path):
    _run_pair(reference_path, samplers.sample_dpm_2, "sample_dpm_2")


def test_dpmpp_2m_vs_reference(reference_path):
    _run_pair(reference_path, samplers.sample_dpmpp_2m, "sample_dpmpp_2m")


def test_lms_vs_reference(reference_path):
    _run_pair(reference_path, samplers.sample_lms, "sample_lms")


def test_euler_ancestral_eta0_vs_reference(reference_path):
    # eta=0 removes stochasticity -> deterministic comparison
    _run_pair(reference_path, samplers.sample_euler_ancestral, "sample_euler_ancestral",
              eta=0.0)


def test_dpmpp_2s_ancestral_eta0_vs_reference(reference_path):
    _run_pair(reference_path, samplers.sample_dpmpp_2s_ancestral,
              "sample_dpmpp_2s_ancestral", eta=0.0)


def test_dpmpp_sde_eta0_vs_reference(reference_path):
    # pass explicit zero noise samplers: the defaults differ (torchsde tree vs
    # our dyadic tree) and eta=0 zeroes the noise contribution anyway
    import torch
    _run_pair(reference_path, samplers.sample_dpmpp_sde, "sample_dpmpp_sde", eta=0.0,
              our_kwargs={"noise_sampler": lambda k, s0, s1: jnp.zeros(SHAPE)},
              ref_kwargs={"noise_sampler": lambda s0, s1: torch.zeros(SHAPE)})


def test_dpmpp_2m_sde_eta0_vs_reference(reference_path):
    import torch
    _run_pair(reference_path, samplers.sample_dpmpp_2m_sde, "sample_dpmpp_2m_sde",
              eta=0.0,
              our_kwargs={"noise_sampler": lambda k, s0, s1: jnp.zeros(SHAPE)},
              ref_kwargs={"noise_sampler": lambda s0, s1: torch.zeros(SHAPE)})


def test_dpm_fast_vs_reference(reference_path):
    import torch
    from k_diffusion import sampling as ref_sampling
    rng = np.random.RandomState(0)
    x0 = (rng.randn(*SHAPE) * 80.0).astype(np.float32)
    ours = samplers.sample_dpm_fast(analytic_denoise, jnp.asarray(x0), 0.05, 80.0, 10,
                                    jax.random.key(0))
    ref = ref_sampling.sample_dpm_fast(torch_denoise, torch.tensor(x0), 0.05, 80.0, 10,
                                       disable=True)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-3, atol=1e-4)


def test_dpm_adaptive_converges():
    """Adaptive solver reaches small sigma with the analytic denoiser: final x
    should approximately equal x0 shrunk to the posterior mean."""
    rng = np.random.RandomState(0)
    x0 = (rng.randn(*SHAPE) * 80.0).astype(np.float32)
    out, info = samplers.sample_dpm_adaptive(analytic_denoise, jnp.asarray(x0), 0.05,
                                             80.0, jax.random.key(0), return_info=True)
    assert info["n_accept"] > 0
    # Solution of the Karras ODE with this denoiser: x(sigma) scales like
    # sqrt(1 + sigma^2), so x(0.05) ~= x(80)/sqrt(1+80^2)*sqrt(1+0.05^2)
    expected = x0 / np.sqrt(1 + 80.0 ** 2) * np.sqrt(1 + 0.05 ** 2)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=0.1, atol=0.05)


def test_heun_stochastic_runs():
    """Churned (stochastic) path executes and stays finite under jit."""
    x = jax.random.normal(jax.random.key(1), SHAPE) * 80.0
    sigmas = schedules.get_sigmas_karras(10, 0.05, 80.0)
    out = jax.jit(lambda x, s, k: samplers.sample_heun(
        analytic_denoise, x, s, k, s_churn=80.0, s_tmin=0.05, s_tmax=50.0,
        s_noise=1.003))(x, sigmas, jax.random.key(2))
    assert np.isfinite(np.asarray(out)).all()


def test_brownian_tree_consistency():
    """W increments are additive and unit-normalized."""
    from kdip_tpu.brownian import BrownianTreeNoiseSampler
    ns = BrownianTreeNoiseSampler((4, 4), 0.05, 80.0, jax.random.key(0))
    # additivity: W(80->1) + scaled W(1->0.05) == W(80->0.05) after unscaling
    n_a = np.asarray(ns(80.0, 1.0)) * np.sqrt(80.0 - 1.0)
    n_b = np.asarray(ns(1.0, 0.05)) * np.sqrt(1.0 - 0.05)
    n_ab = np.asarray(ns(80.0, 0.05)) * np.sqrt(80.0 - 0.05)
    np.testing.assert_allclose(n_a + n_b, n_ab, rtol=1e-3, atol=1e-4)
