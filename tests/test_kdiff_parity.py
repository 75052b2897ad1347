"""Activation parity of the native k-diffusion model vs the reference
ImageDenoiserModelV2, with converted weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import ckpt
from kdip_tpu.models import kdiff


@pytest.fixture(scope="module")
def pair(reference_path):
    import torch
    from k_diffusion.models.image_v2 import ImageDenoiserModelV2 as RefModel

    torch.manual_seed(0)
    ref = RefModel(3, 64, [1, 2], [32, 64], [False, True],
                   mapping_cond_dim=9, has_variance=True).eval()
    ours = kdiff.ImageDenoiserModelV2(
        c_in=3, feats_in=64, depths=(1, 2), channels=(32, 64),
        self_attn_depths=(False, True), mapping_cond_dim=9, has_variance=True)
    params = ckpt.convert_kdiff_state_dict(ref.state_dict(), num_levels=2)
    return ref, ours, params


def test_kdiff_converted_structure(pair):
    ref, ours, params = pair
    init = ours.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                     jnp.float32(1.0), mapping_cond=jnp.zeros((1, 9)))["params"]
    a = {jax.tree_util.keystr(p) for p, _ in
         jax.tree_util.tree_flatten_with_path(init)[0]}
    b = {jax.tree_util.keystr(p) for p, _ in
         jax.tree_util.tree_flatten_with_path(params)[0]}
    assert a == b
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x.shape),
                                                   np.asarray(y.shape)),
        init, params)


def test_kdiff_forward_parity(pair):
    import torch
    ref, ours, params = pair
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    cond = rng.randn(2, 9).astype(np.float32)
    for sigma in [0.3, 5.0]:
        with torch.no_grad():
            r_out, r_lv, r_lvot = ref(torch.tensor(x),
                                      torch.tensor([sigma, sigma]),
                                      mapping_cond=torch.tensor(cond),
                                      return_variance=True)
        o_out, o_lv, o_lvot = ours.apply(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.float32(sigma), mapping_cond=jnp.asarray(cond),
            return_variance=True)
        np.testing.assert_allclose(np.asarray(o_out).transpose(0, 3, 1, 2),
                                   r_out.numpy(), atol=5e-4, rtol=1e-3,
                                   err_msg=f"out sigma={sigma}")
        np.testing.assert_allclose(np.asarray(o_lv).transpose(0, 3, 1, 2),
                                   r_lv.numpy(), atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(o_lvot).transpose(0, 3, 1, 2),
                                   r_lvot.numpy(), atol=5e-4, rtol=1e-3)
