"""Operator tests: adjointness (<Ax, y> == <x, A^T y>), FFT-math parity with
the reference utils_sisr, and Resizer parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import operators as ops
from kdip_tpu.ops import fft as offt
from kdip_tpu.ops import kernels as okernels
from kdip_tpu.ops import resize as oresize

REF_KERNELS = "/root/reference/condition/kernels"


def _dot(a, b):
    return float(jnp.sum(jnp.asarray(a) * jnp.asarray(b)))


@pytest.mark.parametrize("builder,kwargs", [
    ("gaussian_blur", dict(in_shape=(1, 3, 32, 32), kernel_size=9, intensity=2.0)),
    ("motion_blur", dict(in_shape=(1, 3, 32, 32), kernel_size=9, intensity=0.5, seed=0)),
    ("inpainting", dict(mask_opt=dict(mask_type="random", mask_prob_range=(0.5, 0.5),
                                      image_size=32), seed=0)),
    ("colorization", dict()),
    ("noise", dict()),
])
def test_adjointness(builder, kwargs):
    op = ops.get_operator(builder, sigma_s=0.05, **kwargs)
    k1, k2 = jax.random.split(jax.random.key(0))
    x = jax.random.normal(k1, (2, 32, 32, 3))
    y = op.forward(x)
    z = jax.random.normal(k2, y.shape)
    np.testing.assert_allclose(_dot(op.forward(x), z), _dot(x, op.transpose(z)),
                               rtol=1e-4)


def test_sr_fft_pair_adjointness():
    """The SR transpose is the adjoint of the FFT operator downsample∘blur
    (matching the reference's transpose, measurements.py:113-119)."""
    op = ops.get_operator("super_resolution", in_shape=(1, 3, 32, 32),
                          scale_factor=4, sigma_s=0.05)
    k1, k2 = jax.random.split(jax.random.key(0))
    x = jax.random.normal(k1, (1, 32, 32, 3))
    # FFT forward: downsample(ifft(FB fft x))
    Ax = offt.downsample(offt.ifft2(op.FB[..., None] * offt.fft2(x)).real, 4)
    z = jax.random.normal(k2, Ax.shape)
    np.testing.assert_allclose(_dot(Ax, z), _dot(x, op.transpose(z)), rtol=1e-4)


def test_fft_helpers_vs_reference(reference_path):
    import torch
    import condition.diffpir_utils.utils_sisr as sr
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    x_t = torch.tensor(x.transpose(0, 3, 1, 2))
    k = okernels.gaussian_kernel(5, 1.0).astype(np.float32)
    k_t = torch.tensor(k).view(1, 1, 5, 5)

    # p2o
    ref_otf = sr.p2o(k_t, (16, 16)).numpy()[0, 0]
    our_otf = np.asarray(offt.psf_to_otf(jnp.asarray(k), (16, 16)))
    np.testing.assert_allclose(our_otf, ref_otf, rtol=1e-4, atol=1e-6)

    # splits
    ref_sp = sr.splits(x_t, 4).numpy()  # [B, C, H/4, W/4, 16]
    our_sp = np.asarray(offt.splits(jnp.asarray(x), 4))  # [B, H/4, W/4, C, 16]
    np.testing.assert_allclose(our_sp.transpose(0, 3, 1, 2, 4), ref_sp, rtol=1e-5)

    # up/down sample
    ref_up = sr.upsample(x_t, 3).numpy()
    our_up = np.asarray(offt.upsample(jnp.asarray(x), 3))
    np.testing.assert_allclose(our_up.transpose(0, 3, 1, 2), ref_up, rtol=1e-6)
    ref_dn = sr.downsample(x_t, 2).numpy()
    our_dn = np.asarray(offt.downsample(jnp.asarray(x), 2))
    np.testing.assert_allclose(our_dn.transpose(0, 3, 1, 2), ref_dn, rtol=1e-6)

    # pre_calculate
    FB, FBC, F2B, FBFy = sr.pre_calculate(x_t, k_t, 2)
    oFB, oFBC, oF2B, oFBFy = offt.pre_calculate(jnp.asarray(x), jnp.asarray(k), 2)
    np.testing.assert_allclose(np.asarray(oFB), FB.numpy()[0, 0], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(oF2B), F2B.numpy()[0, 0], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(oFBFy).transpose(0, 3, 1, 2), FBFy.numpy(),
                               rtol=1e-3, atol=1e-4)

    # data_solution (DiffPIR closed-form prox)
    alpha = torch.tensor([0.3])
    x_hr = torch.tensor(rng.randn(2, 3, 32, 32).astype(np.float32))
    k_t2 = torch.tensor(k).view(1, 1, 5, 5)
    FB2, FBC2, F2B2, FBFy2 = sr.pre_calculate(x_t, k_t2, 2)
    ref_sol = sr.data_solution(x_hr, FB2, FBC2, F2B2, FBFy2, alpha, 2).numpy()
    oFB2, oFBC2, oF2B2, oFBFy2 = offt.pre_calculate(jnp.asarray(x), jnp.asarray(k), 2)
    our_sol = np.asarray(offt.data_solution(
        jnp.asarray(x_hr.numpy().transpose(0, 2, 3, 1)), oFB2, oFBC2, oF2B2, oFBFy2,
        jnp.float32(0.3), 2))
    np.testing.assert_allclose(our_sol.transpose(0, 3, 1, 2), ref_sol, rtol=1e-3,
                               atol=1e-4)


def test_resizer_vs_reference(reference_path):
    import torch
    from condition.dps_utils.resizer import Resizer
    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    ref_resizer = Resizer((1, 3, 64, 64), 1 / 4)
    ref = ref_resizer(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(oresize.resize(jnp.asarray(x), 1 / 4))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, rtol=1e-3, atol=1e-5)


def test_resizer_upscale_vs_reference(reference_path):
    import torch
    from condition.dps_utils.resizer import Resizer
    rng = np.random.RandomState(0)
    x = rng.randn(1, 16, 16, 3).astype(np.float32)
    ref_resizer = Resizer((1, 3, 16, 16), 2.0)
    ref = ref_resizer(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(oresize.resize(jnp.asarray(x), 2.0))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, rtol=1e-3, atol=1e-5)


def test_blur_operator_vs_reference_kernel(reference_path):
    """Blur with the pinned 61x61 gaussian kernel matches the reference's
    forward (FFT circular convolution)."""
    import torch
    from torch.fft import fft2 as tfft2, ifft2 as tifft2
    import condition.diffpir_utils.utils_sisr as sr

    kernel = np.load(f"{REF_KERNELS}/gaussian_ks61_std3.0.npy").astype(np.float32)
    op = ops.get_operator("gaussian_blur", in_shape=(1, 3, 256, 256),
                          kernel_size=61, intensity=3.0, sigma_s=0.05,
                          kernel=kernel)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 256, 256, 3).astype(np.float32)
    x_t = torch.tensor(x.transpose(0, 3, 1, 2))
    k_t = torch.tensor(kernel).view(1, 1, 61, 61)
    FB, FBC, F2B, _ = sr.pre_calculate(x_t, k_t, 1)
    ref_y = tifft2(FB * tfft2(x_t)).real.numpy()
    our_y = np.asarray(op.forward(jnp.asarray(x)))
    np.testing.assert_allclose(our_y.transpose(0, 3, 1, 2), ref_y, rtol=1e-3, atol=1e-4)


def test_generated_gaussian_matches_pinned_kernel():
    pinned = np.load(f"{REF_KERNELS}/gaussian_ks61_std3.0.npy")
    ours = okernels.gaussian_kernel(61, 3.0)
    np.testing.assert_allclose(ours, pinned, atol=1e-12)


def test_mask_generator_shapes_and_stats():
    m = ops.generate_mask(mask_type="random", mask_prob_range=(0.5, 0.5),
                          image_size=64, seed=0)
    assert m.shape == (64, 64, 3)
    # exactly 50% of pixels masked, identically across channels
    assert abs(m[..., 0].mean() - 0.5) < 0.01
    np.testing.assert_array_equal(m[..., 0], m[..., 1])

    mb = ops.generate_mask(mask_type="box", mask_len_range=(16, 17),
                           image_size=64, seed=0)
    assert (1 - mb).sum() == 16 * 16 * 3


def test_measure_and_noise_models():
    op = ops.get_operator("inpainting", sigma_s=0.05,
                          mask_opt=dict(mask_type="random",
                                        mask_prob_range=(0.3, 0.3), image_size=32),
                          seed=1)
    x = jax.random.normal(jax.random.key(0), (1, 32, 32, 3))
    meas = op.measure(x, jax.random.key(1))
    # masked-out pixels are exactly zero
    assert float(jnp.abs(meas.y * (1 - op.mask)).max()) == 0.0

    noiser = ops.get_noise("gaussian", sigma=0.1)
    y = noiser(jnp.zeros((4, 8, 8, 3)), jax.random.key(2))
    assert 0.05 < float(y.std()) < 0.2

    poiss = ops.get_noise("poisson", rate=1.0)
    yp = poiss(jnp.zeros((4, 8, 8, 3)), jax.random.key(3))
    assert float(jnp.abs(yp).max()) <= 1.0
