"""Tests for DDPM sampling loops, VLB losses, resampler, logger, GNS, tiling."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import ddpm_sampling as dds
from kdip_tpu import diffusion, gns, logger, resample
from kdip_tpu.ops import tiling


def test_normal_kl_and_dgll_vs_reference(reference_path):
    import torch
    from guided_diffusion.losses import (normal_kl,
                                         discretized_gaussian_log_likelihood)
    rng = np.random.RandomState(0)
    m1, lv1 = rng.randn(4, 8), rng.randn(4, 8)
    m2, lv2 = rng.randn(4, 8), rng.randn(4, 8)
    ref = normal_kl(torch.tensor(m1), torch.tensor(lv1), torch.tensor(m2),
                    torch.tensor(lv2)).numpy()
    ours = np.asarray(dds.normal_kl(jnp.asarray(m1), jnp.asarray(lv1),
                                    jnp.asarray(m2), jnp.asarray(lv2)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)

    x = np.clip(rng.randn(4, 8) * 0.5, -1, 1)
    means = rng.randn(4, 8) * 0.1
    log_scales = rng.randn(4, 8) * 0.3
    ref = discretized_gaussian_log_likelihood(
        torch.tensor(x), means=torch.tensor(means),
        log_scales=torch.tensor(log_scales)).numpy()
    ours = np.asarray(dds.discretized_gaussian_log_likelihood(
        jnp.asarray(x), means=jnp.asarray(means),
        log_scales=jnp.asarray(log_scales)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def fake_model():
    """A fixed linear eps+var model shared by torch and jax."""
    rng = np.random.RandomState(42)
    w = rng.randn(1, 1, 3, 6).astype(np.float32) * 0.1

    def jax_fn(x, t):
        out = jnp.einsum("bhwc,ijco->bhwo", x, jnp.asarray(w))
        return out

    import torch

    class TorchFn(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.dummy = torch.nn.Parameter(torch.zeros(1))

        def forward(self, x, t, **kw):
            xn = x.permute(0, 2, 3, 1).numpy()
            out = np.einsum("bhwc,ijco->bhwo", xn, w)
            return torch.tensor(out.transpose(0, 3, 1, 2))

    return jax_fn, TorchFn()


def test_ddim_loop_parity(reference_path, fake_model):
    import torch
    from guided_diffusion.script_util import create_gaussian_diffusion
    jax_fn, torch_fn = fake_model

    ref_diff = create_gaussian_diffusion(steps=1000, learn_sigma=True,
                                         noise_schedule="linear",
                                         timestep_respacing="5")
    tables = diffusion.make_diffusion(1000, "linear", "5")
    rng = np.random.RandomState(0)
    noise = rng.randn(2, 3, 8, 8).astype(np.float32)

    # reference's _WrappedModel remaps respaced t -> original t before the
    # model; our fake model ignores t so the remap is a no-op for outputs.
    ref = ref_diff.ddim_sample_loop(torch_fn, (2, 3, 8, 8), eta=0.0,
                                    noise=torch.tensor(noise),
                                    clip_denoised=True).numpy()
    ours = dds.ddim_sample_loop(tables, jax_fn, (2, 8, 8, 3),
                                jax.random.key(0), eta=0.0,
                                noise=jnp.asarray(noise.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               rtol=1e-3, atol=1e-4)


def test_p_sample_loop_statistics(fake_model):
    """Ancestral loop runs and produces finite output with plausible scale."""
    jax_fn, _ = fake_model
    tables = diffusion.make_diffusion(1000, "linear", "10")
    out = dds.p_sample_loop(tables, jax_fn, (2, 8, 8, 3), jax.random.key(0))
    assert out.shape == (2, 8, 8, 3)
    assert bool(jnp.isfinite(out).all())


def test_training_losses_parity(reference_path, fake_model):
    import torch
    from guided_diffusion.script_util import create_gaussian_diffusion
    jax_fn, torch_fn = fake_model
    ref_diff = create_gaussian_diffusion(steps=1000, learn_sigma=True,
                                         noise_schedule="linear")
    tables = diffusion.make_diffusion(1000, "linear")
    rng = np.random.RandomState(0)
    x0 = (rng.rand(2, 3, 8, 8).astype(np.float32)) * 2 - 1
    noise = rng.randn(2, 3, 8, 8).astype(np.float32)
    t = np.array([5, 700])

    ref_terms = ref_diff.training_losses(torch_fn, torch.tensor(x0),
                                         torch.tensor(t),
                                         noise=torch.tensor(noise))
    our_terms = dds.training_losses(tables, jax_fn,
                                    jnp.asarray(x0.transpose(0, 2, 3, 1)),
                                    jnp.asarray(t), jax.random.key(0),
                                    loss_type="mse",
                                    noise=jnp.asarray(noise.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(our_terms["mse"]),
                               ref_terms["mse"].numpy(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(our_terms["vb"]),
                               ref_terms["vb"].detach().numpy(), rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(our_terms["loss"]),
                               ref_terms["loss"].detach().numpy(), rtol=1e-3,
                               atol=1e-5)


def test_calc_bpd_finite(fake_model):
    jax_fn, _ = fake_model
    tables = diffusion.make_diffusion(1000, "linear", "10")
    x0 = jax.random.uniform(jax.random.key(0), (2, 8, 8, 3)) * 2 - 1
    out = dds.calc_bpd_loop(tables, jax_fn, x0, jax.random.key(1))
    assert out["total_bpd"].shape == (2,)
    assert bool(jnp.isfinite(out["total_bpd"]).all())
    assert out["vb"].shape == (2, 10)


def test_schedule_samplers_vs_reference(reference_path):
    import torch
    # the reference uses the np.int alias removed in numpy 2
    if not hasattr(np, "int"):
        np.int = int
    from guided_diffusion.resample import LossSecondMomentResampler as RefLSM

    class FakeDiff:
        num_timesteps = 20

    ref = RefLSM(FakeDiff())
    ours = resample.LossSecondMomentResampler(20)
    rng = np.random.RandomState(0)
    for _ in range(25):
        ts = rng.randint(0, 20, size=(16,))
        losses = rng.rand(16) * 2
        ref.update_with_all_losses(torch.tensor(ts), torch.tensor(losses))
        ours.update_with_all_losses(ts, losses)
    np.testing.assert_allclose(ours.weights(), ref.weights(), rtol=1e-6)

    u = resample.UniformSampler(20)
    t, w = u.sample(8, np.random.RandomState(0))
    assert t.shape == (8,) and np.allclose(w, 1.0)


def test_logger_sinks(tmp_path):
    with logger.scoped_configure(dir=str(tmp_path), format_strs=["csv", "json", "log"]):
        logger.logkv("a", 1.0)
        logger.logkv_mean("b", 2.0)
        logger.logkv_mean("b", 4.0)
        out = logger.dumpkvs()
        assert out["b"] == 3.0
        logger.logkv("a", 2.0)
        logger.logkv("c", 5.0)  # schema evolution
        logger.dumpkvs()
        logger.log("hello", "world")
    csv_text = (tmp_path / "progress.csv").read_text()
    assert "a" in csv_text.splitlines()[0]
    assert "c" in csv_text.splitlines()[0]
    assert "hello world" in (tmp_path / "log.txt").read_text()


def test_gns_estimator():
    g = gns.GradientNoiseScale(beta=0.5)
    # small batch n=1 with noisy grads, large batch n=8 averaged: if the
    # true gradient is zero, GNS -> large
    rng = np.random.RandomState(0)
    for _ in range(50):
        small = float(rng.rand() * 10 + 10)
        large = small / 8  # pure-noise scaling
        g.update(small, large, 1, 8)
    assert g.get_gns() > 10


def test_tiled_split_exact_for_local_operator():
    """A 3x3 local conv has receptive field << refield, so split inference
    must equal full inference exactly (interior-keep stitching)."""
    kernel = jnp.asarray(np.random.RandomState(0).rand(3, 3, 1, 1), jnp.float32)

    def apply(x):
        C = x.shape[-1]
        k = jnp.tile(kernel, (1, 1, 1, C))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)

    x = jax.random.normal(jax.random.key(0), (1, 128, 96, 3))
    full = apply(x)
    split = tiling.apply_split(apply, x, refield=16, min_size=32)
    np.testing.assert_allclose(np.asarray(split), np.asarray(full), atol=1e-5)
    once = tiling.apply_split(apply, x, refield=16, min_size=32, once=True)
    np.testing.assert_allclose(np.asarray(once), np.asarray(full), atol=1e-5)


def test_x8_ensemble_identity_for_equivariant_fn():
    """x8 self-ensemble of an elementwise fn equals the fn itself."""
    fn = lambda x: x * 2.0 + 0.5
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 3))
    out = tiling.apply_x8(fn, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fn(x)), atol=1e-5)
    # dihedral transforms are involutive under the declared inverses
    for i in range(8):
        inv = 8 - i if i in (3, 5) else i
        back = tiling.augment_img(tiling.augment_img(x, i), inv)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0,
                                   err_msg=f"mode {i}")


def test_fft2c_roundtrip_and_parseval():
    """Centered orthonormal FFT (fastmri parity helpers)."""
    from kdip_tpu.ops import fft as offt
    x = jax.random.normal(jax.random.key(5), (1, 16, 16, 3))
    z = offt.fft2c(x.astype(jnp.complex64))
    back = offt.ifft2c(z).real
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(float(jnp.sum(jnp.abs(z) ** 2)),
                               float(jnp.sum(x ** 2)), rtol=1e-5)


def test_tiled_split_x8_local_operator():
    """mode 4 (split + x8 ensemble) is exact for an isotropic local conv."""
    k1 = jnp.asarray([[0.0, 0.25, 0.0], [0.25, 0.0, 0.25],
                      [0.0, 0.25, 0.0]])[..., None, None]

    def apply(x):
        C = x.shape[-1]
        k = jnp.tile(k1, (1, 1, 1, C))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)

    x = jax.random.normal(jax.random.key(6), (1, 64, 64, 3))
    full = apply(x)
    ens = tiling.tiled_inference(apply, x, mode=4, refield=16, min_size=32)
    # isotropic kernel commutes with the dihedral group; split is exact
    np.testing.assert_allclose(np.asarray(ens), np.asarray(full), atol=1e-5)
