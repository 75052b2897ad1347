"""The alternative conv formulations (ops/conv_mxu.py) are exact
re-expressions of the same 3x3 stride-1 same-pad conv: every variant must
match XLA's conv_general_dilated to float tolerance, in value and in vjp,
so the per-stage router can swap them freely."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu.ops import conv_mxu

SHAPES = [(1, 8, 8, 4, 6), (2, 16, 16, 8, 8), (1, 6, 10, 3, 5)]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("variant", ["conv3x3_nchw", "conv3x3_im2col"])
def test_variant_matches_lax(shape, variant):
    B, H, W, C, F = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, C, F) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(F) * 0.1, jnp.float32)
    want = conv_mxu.conv3x3_nhwc(x, k, b)
    got = getattr(conv_mxu, variant)(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("variant", ["conv3x3_nchw", "conv3x3_im2col"])
def test_variant_vjp_matches_lax(variant):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 4, 6) * 0.1, jnp.float32)

    def loss(fn, xx, kk):
        return jnp.sum(fn(xx, kk) ** 2)

    gw = jax.grad(lambda xx, kk: loss(conv_mxu.conv3x3_nhwc, xx, kk),
                  argnums=(0, 1))(x, k)
    gg = jax.grad(lambda xx, kk: loss(getattr(conv_mxu, variant), xx, kk),
                  argnums=(0, 1))(x, k)
    for a, b in zip(gw, gg):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_im2col_bf16_accumulates_like_lax_bf16():
    """The bf16 dtype knob keeps the contraction in bf16 inputs like the
    torso's convs; outputs agree with the bf16 lax conv within bf16 noise."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 16), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 16, 8) * 0.1, jnp.bfloat16)
    want = np.asarray(conv_mxu.conv3x3_nhwc(x, k), np.float32)
    got = np.asarray(conv_mxu.conv3x3_im2col(x, k), np.float32)
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.15)
