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


class TestSplitSkipDecoder:
    """The decoder split-skip path (ADMUNet.split_skip): norm/silu/conv on
    the (h, skip) halves with sliced params instead of materializing the
    concat. Must be the same math (up to one bf16 rounding), share the
    parameter tree with the concat form, and leave f32/f64 parity torsos
    untouched."""

    KW = dict(image_size=32, model_channels=32, num_res_blocks=1,
              attention_resolutions=(4,), channel_mult=(1, 2, 4),
              num_heads=2, num_head_channels=16, out_channels=6)

    def _randomized_params(self, model, x, t):
        p0 = model.init(jax.random.key(0), x, t)["params"]
        leaves, treedef = tree_util.tree_flatten(p0)
        keys = jax.random.split(jax.random.key(42), len(leaves))
        # randomize everything incl. zero-init convs so outputs are nonzero
        return tree_util.tree_unflatten(
            treedef, [v + 0.05 * jax.random.normal(k, v.shape, v.dtype)
                      for v, k in zip(leaves, keys)])

    def _data(self):
        x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3), jnp.float32)
        return x, jnp.array([3.0, 500.0])

    def test_bf16_split_matches_concat(self):
        from kdip_tpu.models import adm
        x, t = self._data()
        m_split = adm.ADMUNet(dtype=jnp.bfloat16, split_skip=True, **self.KW)
        m_plain = adm.ADMUNet(dtype=jnp.bfloat16, split_skip=False, **self.KW)
        p = self._randomized_params(m_plain, x, t)
        o_split = np.asarray(m_split.apply({"params": p}, x, t), np.float32)
        o_plain = np.asarray(m_plain.apply({"params": p}, x, t), np.float32)
        scale = np.abs(o_plain).max()
        assert np.abs(o_split - o_plain).max() <= 0.03 * scale

        # and both bf16 forms sit at the same distance from the f32 truth
        # (the split adds at most one extra bf16 rounding per decoder block)
        m32 = adm.ADMUNet(dtype=jnp.float32, split_skip=False, **self.KW)
        o32 = np.asarray(m32.apply({"params": p}, x, t))
        assert (np.abs(o_split - o32).max()
                <= np.abs(o_plain - o32).max() + 0.02 * scale)

    def test_param_tree_identical(self):
        from kdip_tpu.models import adm
        x, t = self._data()
        trees = [
            adm.ADMUNet(dtype=d, split_skip=s, **self.KW).init(
                jax.random.key(0), x, t)["params"]
            for d, s in ((jnp.bfloat16, True), (jnp.bfloat16, False),
                         (jnp.float32, True))]
        flat = [tree_util.tree_leaves_with_path(t_) for t_ in trees]
        assert len(flat[0]) == len(flat[1]) == len(flat[2])
        for a, b, c in zip(*flat):
            assert (tree_util.keystr(a[0]) == tree_util.keystr(b[0])
                    == tree_util.keystr(c[0]))
            np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
            np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(c[1]))

    def test_f32_torso_bit_identical(self):
        """split_skip must be a no-op on parity torsos (gate is static)."""
        from kdip_tpu.models import adm
        x, t = self._data()
        ma = adm.ADMUNet(dtype=jnp.float32, split_skip=True, **self.KW)
        mb = adm.ADMUNet(dtype=jnp.float32, split_skip=False, **self.KW)
        p = self._randomized_params(mb, x, t)
        oa = np.asarray(ma.apply({"params": p}, x, t))
        ob = np.asarray(mb.apply({"params": p}, x, t))
        np.testing.assert_array_equal(oa, ob)

    def test_misaligned_split_falls_back(self):
        """64+32 channels -> group size 3: not group-aligned, must fall
        back to the concat path and still run."""
        from kdip_tpu.models import adm
        kw = dict(self.KW, channel_mult=(1, 2))
        m = adm.ADMUNet(dtype=jnp.bfloat16, split_skip=True, **kw)
        x, t = self._data()
        p = m.init(jax.random.key(0), x, t)["params"]
        out = np.asarray(m.apply({"params": p}, x, t))
        assert np.isfinite(out).all()

    def test_grads_match_concat(self):
        """The vjp through the split path agrees with the concat path
        (guided sampling differentiates through the decoder)."""
        from kdip_tpu.models import adm
        x, t = self._data()
        m_split = adm.ADMUNet(dtype=jnp.bfloat16, split_skip=True, **self.KW)
        m_plain = adm.ADMUNet(dtype=jnp.bfloat16, split_skip=False, **self.KW)
        p = self._randomized_params(m_plain, x, t)

        def loss(model, xx):
            out = model.apply({"params": p}, xx, t)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g_split = np.asarray(jax.grad(lambda xx: loss(m_split, xx))(x))
        g_plain = np.asarray(jax.grad(lambda xx: loss(m_plain, xx))(x))
        scale = np.abs(g_plain).max()
        assert np.abs(g_split - g_plain).max() <= 0.05 * scale
