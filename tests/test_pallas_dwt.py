"""Pallas fused DWT: parity with the jnp reference implementation
(interpret mode on CPU; the kernel compiles natively on TPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from kdip_tpu.ops import transforms as tfm
from kdip_tpu.ops.pallas_dwt import dwt2_pallas, idwt2_pallas


def test_pallas_dwt_matches_jnp():
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    for level in [1, 2, 3]:
        np.testing.assert_allclose(
            np.asarray(dwt2_pallas(x, level)),
            np.asarray(tfm.dwt2(x, level=level)), atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(idwt2_pallas(x, level)),
            np.asarray(tfm.idwt2(x, level=level)), atol=2e-6)


def test_pallas_dwt_roundtrip_and_vjp():
    x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3))
    z = dwt2_pallas(x, 3)
    np.testing.assert_allclose(np.asarray(idwt2_pallas(z, 3)), np.asarray(x),
                               atol=2e-6)
    # orthonormality via vjp: adjoint == inverse
    ct = jax.random.normal(jax.random.key(2), x.shape)
    _, vjp = jax.vjp(lambda a: dwt2_pallas(a, 3), x)
    np.testing.assert_allclose(np.asarray(vjp(ct)[0]),
                               np.asarray(tfm.idwt2(ct, level=3)), atol=2e-6)


def test_ortho_transform_pallas_option():
    ot = tfm.OrthoTransform("dwt", use_pallas=True)
    x = jax.random.normal(jax.random.key(3), (1, 32, 32, 3))
    np.testing.assert_allclose(np.asarray(ot.inv(ot(x))), np.asarray(x),
                               atol=2e-6)
