"""Orthonormality, inverse, and parity tests for DCT / Haar DWT."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu.ops import transforms as tfm


def test_dct_orthonormal_roundtrip():
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    z = tfm.dct(x)
    back = tfm.idct(z)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)
    # Parseval: energy preserved
    np.testing.assert_allclose(float(jnp.sum(x ** 2)), float(jnp.sum(z ** 2)),
                               rtol=1e-5)


def test_dct_vs_scipy():
    from scipy.fft import dctn, idctn
    rng = np.random.RandomState(0)
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    ours = np.asarray(tfm.dct(jnp.asarray(x)))
    # the reference applies dctn over all axes (condition/utils.py:94)
    ref = dctn(x, norm="ortho")
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    ours_i = np.asarray(tfm.idct(jnp.asarray(x)))
    ref_i = idctn(x, norm="ortho")
    np.testing.assert_allclose(ours_i, ref_i, atol=1e-5)


def test_dct_batch_independence():
    """dct must not couple images across the batch axis (ADVICE r1): each
    image's transform equals its own B=1 transform."""
    x = jax.random.normal(jax.random.key(7), (3, 8, 8, 3))
    z = np.asarray(tfm.dct(x))
    for b in range(3):
        zb = np.asarray(tfm.dct(x[b:b + 1]))
        np.testing.assert_allclose(z[b:b + 1], zb, atol=1e-6)


def test_dwt_orthonormal_roundtrip():
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    z = tfm.dwt2(x, level=3)
    assert z.shape == x.shape
    back = tfm.idwt2(z, level=3)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(float(jnp.sum(x ** 2)), float(jnp.sum(z ** 2)),
                               rtol=1e-5)


def test_dwt_adjoint_equals_inverse():
    """Orthonormal => W^T == W^{-1}: vjp of dwt2 must equal idwt2."""
    x = jax.random.normal(jax.random.key(2), (1, 16, 16, 3))
    z = jax.random.normal(jax.random.key(3), (1, 16, 16, 3))
    _, vjp = jax.vjp(lambda a: tfm.dwt2(a, level=2), x)
    np.testing.assert_allclose(np.asarray(vjp(z)[0]),
                               np.asarray(tfm.idwt2(z, level=2)), atol=1e-5)


def test_dwt_quadrant_layout():
    """A constant image concentrates all energy in the level-3 approximation
    (top-left) corner."""
    x = jnp.ones((1, 32, 32, 3))
    z = tfm.dwt2(x, level=3)
    corner = z[:, :4, :4, :]
    np.testing.assert_allclose(float(jnp.sum(corner ** 2)),
                               float(jnp.sum(z ** 2)), rtol=1e-6)
    # approximation coefficients of a constant 1-image at level 3: 2^3 = 8
    np.testing.assert_allclose(np.asarray(corner), 8.0, rtol=1e-5)


def test_dwt_level1_haar_values():
    """Level-1 on a 2x2 block matches the Haar butterfly by hand."""
    x = jnp.array([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2, 1)
    z = np.asarray(tfm.dwt2(x, level=1))[0, :, :, 0]
    # LL = sum/2 = 5, LH (W detail) = (1-2+3-4)/2 = -1,
    # HL (H detail) = (1+2-3-4)/2 = -2, HH = (1-2-3+4)/2 = 0
    np.testing.assert_allclose(z, np.array([[5.0, -1.0], [-2.0, 0.0]]), atol=1e-6)


def test_ortho_transform_dispatch():
    x = jax.random.normal(jax.random.key(4), (1, 16, 16, 3))
    for t in [None, "dct", "dwt"]:
        ot = tfm.OrthoTransform(t)
        np.testing.assert_allclose(np.asarray(ot.inv(ot(x))), np.asarray(x),
                                   atol=1e-5)
    with pytest.raises(ValueError):
        tfm.OrthoTransform("nope")


def test_ot_covariance_symmetric_psd():
    ot = tfm.OrthoTransform("dwt")
    v = jnp.abs(jax.random.normal(jax.random.key(5), (1, 16, 16, 3))) + 0.1
    C = tfm.ot_covariance(ot, v)
    a = jax.random.normal(jax.random.key(6), (1, 16, 16, 3))
    b = jax.random.normal(jax.random.key(7), (1, 16, 16, 3))
    # symmetry <Ca, b> == <a, Cb>
    np.testing.assert_allclose(float(jnp.sum(C(a) * b)), float(jnp.sum(a * C(b))),
                               rtol=1e-4)
    # PSD: <a, Ca> >= 0
    assert float(jnp.sum(a * C(a))) > 0
