"""Adapter coverage: v-denoiser, schedule sigmas, EDM denoiser factory."""

import numpy as np

import jax.numpy as jnp

from kdip_tpu import diffusion, precond


def test_discrete_v_denoiser_vs_reference(reference_path):
    import torch
    from k_diffusion.external import DiscreteVDDPMDenoiser

    betas = diffusion.get_named_beta_schedule("linear", 1000)
    ac = np.cumprod(1 - betas)

    class Inner(torch.nn.Module):
        def forward(self, x, t, **kw):
            return x * 0.3

    ref = DiscreteVDDPMDenoiser(Inner(), torch.tensor(ac), quantize=False)
    tables = diffusion.make_tables(betas)
    ours = precond.make_discrete_v_denoiser(lambda p, x, t: x * 0.3,
                                            tables.log_sigmas)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 4, 3).astype(np.float32)
    for sigma in [0.1, 1.0, 20.0]:
        ref_out = ref(torch.tensor(x.transpose(0, 3, 1, 2)),
                      torch.tensor([sigma, sigma])).numpy()
        our_out = np.asarray(ours(None, jnp.asarray(x), jnp.float32(sigma)))
        np.testing.assert_allclose(our_out.transpose(0, 3, 1, 2), ref_out,
                                   rtol=1e-4, atol=1e-5)


def test_schedule_sigmas_vs_reference(reference_path):
    import torch
    from k_diffusion.external import DiscreteSchedule

    betas = diffusion.get_named_beta_schedule("linear", 1000)
    ac = np.cumprod(1 - betas)
    sig = np.sqrt((1 - ac) / ac)
    ref = DiscreteSchedule(torch.tensor(sig, dtype=torch.float32), quantize=False)
    tables = diffusion.make_tables(betas)

    np.testing.assert_allclose(
        np.asarray(precond.schedule_sigmas(tables.log_sigmas)),
        ref.get_sigmas().numpy(), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(precond.schedule_sigmas(tables.log_sigmas, 25)),
        ref.get_sigmas(25).numpy(), rtol=1e-4, atol=1e-6)


def test_edm_denoiser_factory():
    denoise = precond.make_edm_denoiser(lambda p, x, s: x * 0.0,
                                        sigma_data=0.5)
    x = jnp.ones((1, 4, 4, 3))
    sigma = jnp.float32(0.5)
    out = denoise(None, x, sigma)
    # model output 0 => x0 = c_skip * x
    c_skip = 0.5 ** 2 / (0.5 ** 2 + 0.5 ** 2)
    np.testing.assert_allclose(np.asarray(out), c_skip, rtol=1e-6)


def test_compvis_adapters_vs_reference(reference_path):
    """The named CompVis surface: sigma table from alphas_cumprod
    (ref: external.py:172-179 CompVisDenoiser, 211-218 CompVisVDenoiser)."""
    import torch
    from k_diffusion.external import CompVisDenoiser, CompVisVDenoiser

    betas = diffusion.get_named_beta_schedule("linear", 1000)
    ac = np.cumprod(1 - betas)

    class InnerEps(torch.nn.Module):
        alphas_cumprod = torch.tensor(ac)

        def apply_model(self, x, t, cond=None):
            return x * 0.3

    class InnerV(InnerEps):
        pass

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 4, 3).astype(np.float32)

    ref_eps = CompVisDenoiser(InnerEps(), quantize=True)
    ours_eps = precond.make_compvis_eps_denoiser(
        lambda p, xx, t: xx * 0.3, ac, quantize=True)
    ref_v = CompVisVDenoiser(InnerV(), quantize=False)
    ours_v = precond.make_compvis_v_denoiser(
        lambda p, xx, t: xx * 0.3, ac, quantize=False)

    for sigma in [0.1, 1.0, 20.0]:
        st = torch.tensor([sigma, sigma])
        want = ref_eps(torch.tensor(x.transpose(0, 3, 1, 2)), st).numpy()
        got = np.asarray(ours_eps(None, jnp.asarray(x), jnp.float32(sigma)))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                                   rtol=1e-4, atol=1e-5)
        want = ref_v(torch.tensor(x.transpose(0, 3, 1, 2)), st, cond=None).numpy()
        got = np.asarray(ours_v(None, jnp.asarray(x), jnp.float32(sigma)))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                                   rtol=1e-4, atol=1e-5)
