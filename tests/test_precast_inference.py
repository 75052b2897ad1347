"""precast_inference_params: the tree-level bf16 cast must be a pure
performance transform — bit-identical outputs on a bf16-torso model, f32
GroupNorm affines preserved, and training-side trees untouched by default
paths (the util is inference-only by contract)."""

import jax
import jax.numpy as jnp
import numpy as np

from kdip_tpu.models import adm
from kdip_tpu.utils import precast_inference_params

SIZE = 16


def _tiny(dtype):
    model = adm.ADMUNet(image_size=SIZE, model_channels=32, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_heads=2, num_head_channels=16, out_channels=6,
                        dtype=dtype)
    params = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)),
                        jnp.zeros((1,)))["params"]
    return model, params


def test_precast_outputs_bit_identical():
    """flax's promote_dtype already casts f32 params to the bf16 compute
    dtype at every use-site; hoisting the cast to the tree must not change
    a single bit of the output."""
    model, params = _tiny(jnp.bfloat16)
    x = jax.random.uniform(jax.random.key(1), (2, SIZE, SIZE, 3)) * 2 - 1
    t = jnp.asarray([3.0, 977.0])
    f = jax.jit(lambda p: model.apply({"params": p}, x, t))
    np.testing.assert_array_equal(
        np.asarray(f(params)),
        np.asarray(f(precast_inference_params(params))))


def test_precast_keeps_groupnorm_f32():
    _, params = _tiny(jnp.bfloat16)
    cast = precast_inference_params(params)
    n_gn = n_bf16 = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(cast):
        if any(getattr(k, "key", "") == "GroupNorm_0" for k in path):
            assert leaf.dtype == jnp.float32, path
            n_gn += 1
        elif jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.bfloat16, path
            n_bf16 += 1
    assert n_gn > 0 and n_bf16 > 0


def test_precast_halves_param_bytes():
    _, params = _tiny(jnp.bfloat16)
    def nbytes(tree):
        return sum(leaf.size * leaf.dtype.itemsize
                   for leaf in jax.tree_util.tree_leaves(tree))
    assert nbytes(precast_inference_params(params)) < 0.6 * nbytes(params)
