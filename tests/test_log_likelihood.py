"""ODE log-likelihood: validated against the closed form for a Gaussian
model where the probability-flow ODE is exactly integrable."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import samplers


def test_log_likelihood_gaussian_closed_form():
    """For N(0, I) data, D(x, sigma) = x/(1+sigma^2) is the exact posterior
    mean, and the model density at sigma_min is N(0, (1+sigma_min^2) I).
    The ODE estimate must match the analytic log-density."""
    denoise = lambda x, sigma, key: x / (1 + sigma ** 2)
    rng = np.random.RandomState(0)
    x = rng.randn(4, 8, 8, 1).astype(np.float32)
    sigma_min, sigma_max = 1e-2, 80.0

    ll, info = samplers.log_likelihood(denoise, jnp.asarray(x), sigma_min,
                                       sigma_max, jax.random.key(0), steps=200)
    var = 1 + sigma_min ** 2
    analytic = -0.5 * (np.sum(x.reshape(4, -1) ** 2, axis=1) / var
                       + x[0].size * np.log(2 * np.pi * var))
    # Hutchinson estimator with one probe: per-example noise is a few nats
    # on a 64-dim problem; compare with generous tolerance + mean agreement
    np.testing.assert_allclose(np.asarray(ll), analytic, rtol=0.05, atol=3.0)
    assert info["fevals"] == 800


def test_log_likelihood_adaptive_matches_closed_form():
    """dopri5 with error control (the reference's torchdiffeq path,
    sampling.py:296) on the same exactly-integrable model: must agree with
    the analytic density and with the fixed-step estimate, using adaptively
    chosen steps."""
    denoise = lambda x, sigma, key: x / (1 + sigma ** 2)
    rng = np.random.RandomState(0)
    x = rng.randn(4, 8, 8, 1).astype(np.float32)
    sigma_min, sigma_max = 1e-2, 80.0

    ll, info = samplers.log_likelihood_adaptive(
        denoise, jnp.asarray(x), sigma_min, sigma_max, jax.random.key(0),
        atol=1e-4, rtol=1e-4)
    var = 1 + sigma_min ** 2
    analytic = -0.5 * (np.sum(x.reshape(4, -1) ** 2, axis=1) / var
                       + x[0].size * np.log(2 * np.pi * var))
    np.testing.assert_allclose(np.asarray(ll), analytic, rtol=0.05, atol=3.0)
    assert int(info["steps"]) < 1000  # converged before the cap
    assert int(info["fevals"]) > 6  # actually adapted over multiple steps


def test_log_likelihood_adaptive_tightens_with_tolerance():
    """Tighter tolerances must not increase error and must cost more NFEs."""
    denoise = lambda x, sigma, key: x / (1 + sigma ** 2)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 4, 1).astype(np.float32)
    lo, info_lo = samplers.log_likelihood_adaptive(
        denoise, jnp.asarray(x), 1e-2, 80.0, jax.random.key(0),
        atol=1e-2, rtol=1e-2)
    hi, info_hi = samplers.log_likelihood_adaptive(
        denoise, jnp.asarray(x), 1e-2, 80.0, jax.random.key(0),
        atol=1e-5, rtol=1e-5)
    assert int(info_hi["fevals"]) > int(info_lo["fevals"])
    var = 1 + 1e-4
    analytic = -0.5 * (np.sum(x.reshape(2, -1) ** 2, axis=1) / var
                       + x[0].size * np.log(2 * np.pi * var))
    err_hi = np.abs(np.asarray(hi) - analytic).max()
    assert err_hi < 1.0
