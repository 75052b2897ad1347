"""Tests for EDM scalings and sigma<->t interpolation vs the reference."""

import numpy as np

import jax.numpy as jnp

from kdip_tpu import diffusion, precond


def test_sigma_to_t_roundtrip():
    tables = diffusion.make_tables(diffusion.get_named_beta_schedule("linear", 1000))
    sigmas = jnp.array([0.02, 0.1, 1.0, 10.0, 70.0])
    t = precond.sigma_to_t(tables.log_sigmas, sigmas)
    back = precond.t_to_sigma(tables.log_sigmas, t)
    np.testing.assert_allclose(np.asarray(back), np.asarray(sigmas), rtol=1e-4)


def test_sigma_to_t_vs_reference(reference_path):
    import torch
    from k_diffusion.external import DiscreteSchedule
    betas = diffusion.get_named_beta_schedule("linear", 1000)
    ac = np.cumprod(1 - betas)
    ref_sigmas = torch.tensor(np.sqrt((1 - ac) / ac), dtype=torch.float32)
    ref = DiscreteSchedule(ref_sigmas, quantize=False)

    tables = diffusion.make_tables(betas)
    test_sigmas = np.array([0.015, 0.11, 0.9, 3.3, 25.0, 79.0], dtype=np.float32)
    ref_t = ref.sigma_to_t(torch.tensor(test_sigmas)).numpy()
    our_t = np.asarray(precond.sigma_to_t(tables.log_sigmas, jnp.asarray(test_sigmas)))
    np.testing.assert_allclose(our_t, ref_t, rtol=1e-4, atol=1e-3)

    # quantized variant
    ref_tq = ref.sigma_to_t(torch.tensor(test_sigmas), quantize=True).numpy()
    our_tq = np.asarray(precond.sigma_to_t(tables.log_sigmas, jnp.asarray(test_sigmas),
                                           quantize=True))
    np.testing.assert_array_equal(our_tq, ref_tq)

    # t_to_sigma
    t_vals = np.array([0.0, 1.5, 500.25, 998.9], dtype=np.float32)
    ref_s = ref.t_to_sigma(torch.tensor(t_vals)).numpy()
    our_s = np.asarray(precond.t_to_sigma(tables.log_sigmas, jnp.asarray(t_vals)))
    np.testing.assert_allclose(our_s, ref_s, rtol=1e-4)


def test_edm_scalings_vs_reference(reference_path):
    import torch
    from k_diffusion.layers import Denoiser

    class Identity(torch.nn.Module):
        def forward(self, x, sigma, **kw):
            return x

    ref = Denoiser(Identity(), sigma_data=0.5)
    sigma = 2.7
    c_skip, c_out, c_in = ref.get_scalings(torch.tensor(sigma))
    o_skip, o_out, o_in = precond.edm_scalings(jnp.float32(sigma), sigma_data=0.5)
    np.testing.assert_allclose(float(o_skip), float(c_skip), rtol=1e-5)
    np.testing.assert_allclose(float(o_out), float(c_out), rtol=1e-5)
    np.testing.assert_allclose(float(o_in), float(c_in), rtol=1e-5)


def test_discrete_eps_denoiser_matches_reference_formula():
    """x0 = x + eps * c_out with a fake eps-model."""
    tables = diffusion.make_tables(diffusion.get_named_beta_schedule("linear", 1000))
    fake_eps = jnp.ones((1, 4, 4, 3)) * 0.3

    def model_apply(params, x_scaled, t):
        return fake_eps

    denoise = precond.make_discrete_eps_denoiser(model_apply, tables.log_sigmas)
    x = jnp.ones((1, 4, 4, 3))
    sigma = jnp.float32(0.8)
    out = denoise(None, x, sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x + fake_eps * -sigma), rtol=1e-6)
