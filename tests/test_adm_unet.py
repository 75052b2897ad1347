"""Activation parity of the Flax ADM UNet vs the reference PyTorch UNetModel.

The single highest-risk parity item (SURVEY.md §7 step 2): we instantiate the
reference torch model with random init, convert its state dict with
`ckpt.convert_adm_state_dict`, and require per-pixel output agreement.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu import ckpt
from kdip_tpu.models import adm


def _build_pair(reference_path, *, image_size=32, model_channels=32,
                num_res_blocks=1, attention_ds=(2,), channel_mult=(1, 2),
                num_head_channels=16, use_scale_shift_norm=True,
                resblock_updown=True, use_new_attention_order=False,
                num_classes=None, seed=0):
    import torch
    from guided_diffusion.unet import UNetModel

    torch.manual_seed(seed)
    torch_model = UNetModel(
        image_size=image_size, in_channels=3, model_channels=model_channels,
        out_channels=6, num_res_blocks=num_res_blocks,
        attention_resolutions=set(attention_ds), dropout=0.0,
        channel_mult=channel_mult, num_classes=num_classes,
        num_heads=4, num_head_channels=num_head_channels,
        use_scale_shift_norm=use_scale_shift_norm,
        resblock_updown=resblock_updown,
        use_new_attention_order=use_new_attention_order,
    ).eval()

    flax_model = adm.ADMUNet(
        image_size=image_size, in_channels=3, model_channels=model_channels,
        out_channels=6, num_res_blocks=num_res_blocks,
        attention_resolutions=tuple(attention_ds), dropout=0.0,
        channel_mult=channel_mult, num_classes=num_classes,
        num_heads=4, num_head_channels=num_head_channels,
        use_scale_shift_norm=use_scale_shift_norm,
        resblock_updown=resblock_updown,
        use_new_attention_order=use_new_attention_order,
    )
    params = ckpt.convert_adm_state_dict(torch_model.state_dict())
    return torch_model, flax_model, params


def _compare(torch_model, flax_model, params, image_size, num_classes=None, atol=2e-4):
    import torch
    rng = np.random.RandomState(0)
    x = rng.randn(2, image_size, image_size, 3).astype(np.float32)
    t = np.array([10.0, 700.0], dtype=np.float32)
    y = np.array([3, 7]) if num_classes else None

    with torch.no_grad():
        kwargs = {"y": torch.tensor(y)} if num_classes else {}
        ref = torch_model(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(t),
                          **kwargs).numpy().transpose(0, 2, 3, 1)
    kwargs = {"y": jnp.asarray(y)} if num_classes else {}
    ours = flax_model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t), **kwargs)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=atol, rtol=1e-3)


def test_adm_parity_default(reference_path):
    tm, fm, params = _build_pair(reference_path)
    _compare(tm, fm, params, 32)


def test_adm_parity_new_attention_order(reference_path):
    tm, fm, params = _build_pair(reference_path, use_new_attention_order=True)
    _compare(tm, fm, params, 32)


def test_adm_parity_conv_resample(reference_path):
    tm, fm, params = _build_pair(reference_path, resblock_updown=False)
    _compare(tm, fm, params, 32)


def test_adm_parity_no_scale_shift(reference_path):
    tm, fm, params = _build_pair(reference_path, use_scale_shift_norm=False)
    _compare(tm, fm, params, 32)


def test_adm_parity_class_cond(reference_path):
    tm, fm, params = _build_pair(reference_path, num_classes=10)
    _compare(tm, fm, params, 32, num_classes=10)


def test_adm_parity_multilevel(reference_path):
    """3-level topology with attention at two scales + 2 res blocks."""
    tm, fm, params = _build_pair(reference_path, image_size=32,
                                 channel_mult=(1, 2, 4), num_res_blocks=2,
                                 attention_ds=(2, 4))
    _compare(tm, fm, params, 32)


def test_adm_return_feature(reference_path):
    import torch
    tm, fm, params = _build_pair(reference_path)
    rng = np.random.RandomState(1)
    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    t = np.array([500.0], dtype=np.float32)
    with torch.no_grad():
        ref_out, ref_feat = tm(torch.tensor(x.transpose(0, 3, 1, 2)),
                               torch.tensor(t), return_feature=True)
    out, feat = fm.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                         return_feature=True)
    np.testing.assert_allclose(np.asarray(out),
                               ref_out.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)
    # fp32 conv accumulation-order differences grow through the torso; the
    # feature map agrees to ~0.5% while the (zero-init-headed) output stays
    # at 2e-4.
    np.testing.assert_allclose(np.asarray(feat),
                               ref_feat.numpy().transpose(0, 2, 3, 1),
                               atol=6e-3, rtol=1e-2)


def test_adm_init_matches_converted_structure(reference_path):
    """flax init produces the same tree structure the converter emits."""
    tm, fm, params = _build_pair(reference_path)
    init_params = fm.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                          jnp.zeros((1,)))["params"]
    init_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(init_params)[0]}
    conv_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(params)[0]}
    assert init_paths == conv_paths
    # and shapes agree
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a.shape), np.asarray(b.shape)), init_params, params)
