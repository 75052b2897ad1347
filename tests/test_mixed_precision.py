"""Mixed-precision torso invariants.

The production torso runs bf16 with f32 GroupNorm statistics (the TPU
analogue of the reference's fp16 torso + f32 norms,
guided_diffusion/nn.py:17-19, fp16_util.py). GroupNorm32 dispatches:
f32/f64 inputs -> flax GroupNorm with the reference's exact op ordering
(parity paths); bf16/f16 -> _FusedGroupNorm (f32 stats + fused f32 apply,
no materialized f32 copies). These tests pin that the fused path is the
same function up to output-dtype rounding, and that the parameter tree is
identical across dtypes (checkpoint/converter compatibility).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import tree_util

from kdip_tpu.models.layers import GroupNorm32


@pytest.mark.parametrize("low_dtype", [jnp.bfloat16, jnp.float16])
def test_fused_groupnorm_matches_f32_reference(low_dtype):
    gn = GroupNorm32(num_groups=32)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 128)) * 3 + 1.5
    v = gn.init(jax.random.key(1), x)
    # non-trivial scale/bias so the affine part is exercised
    v = jax.tree.map(
        lambda a: a + jax.random.normal(jax.random.key(2), a.shape) * 0.3, v)

    ref = gn.apply(v, x).astype(low_dtype)          # f32 path, then rounded
    out = gn.apply(v, x.astype(low_dtype))          # fused low-precision path
    assert out.dtype == low_dtype

    d = np.abs(out.astype(np.float32) - ref.astype(np.float32))
    # identical up to output rounding: a few ulps of the low dtype at the
    # ~1.0 magnitude of normalized activations
    ulp = 0.0078125 if low_dtype == jnp.bfloat16 else 0.00097656
    assert float(d.max()) <= 6 * ulp
    assert float(d.mean()) <= ulp


def test_groupnorm_param_tree_dtype_agnostic():
    gn = GroupNorm32(num_groups=8)
    x = jnp.ones((1, 8, 8, 32))
    trees = [gn.init(jax.random.key(0), x.astype(d))
             for d in (jnp.float32, jnp.bfloat16, jnp.float16)]
    s0 = tree_util.tree_structure(trees[0])
    assert all(tree_util.tree_structure(t) == s0 for t in trees[1:])
    # scale/bias stay f32 regardless of torso dtype
    for t in trees:
        assert all(a.dtype == jnp.float32 for a in jax.tree.leaves(t))
    # and the names match what ckpt converters target
    assert set(trees[0]["params"]["GroupNorm_0"]) == {"scale", "bias"}


def test_bf16_unet_close_to_f32():
    """Whole-torso sanity: a tiny ADM UNet in bf16 stays close to its f32
    evaluation (the invariant bench.py's production config relies on)."""
    from kdip_tpu.models import adm

    kw = dict(in_channels=3, model_channels=32, out_channels=3,
              num_res_blocks=1, attention_resolutions=(2,),
              channel_mult=(1, 2), num_heads=2, image_size=16)
    m32 = adm.ADMUNet(dtype=jnp.float32, **kw)
    mbf = adm.ADMUNet(dtype=jnp.bfloat16, **kw)
    x = jax.random.normal(jax.random.key(3), (2, 16, 16, 3))
    t = jnp.array([10.0, 500.0])
    v = m32.init(jax.random.key(4), x, t)
    y32 = m32.apply(v, x, t)
    ybf = mbf.apply(v, x.astype(jnp.bfloat16), t).astype(jnp.float32)
    err = np.abs(np.asarray(y32) - np.asarray(ybf))
    scale = float(np.abs(np.asarray(y32)).max())
    assert float(err.max()) <= 0.1 * max(scale, 1.0)
