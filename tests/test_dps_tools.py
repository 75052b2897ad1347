"""DPS aux tooling: parity vs the reference's tools.py / fastmri_utils.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdip_tpu.ops import dps_tools as dt


def test_spatial_discounting_mask_parity(reference_path):
    from condition.dps_utils.tools import spatial_discounting_mask as ref_sdm

    cfg = {"spatial_discounting_gamma": 0.9, "mask_shape": (16, 24),
           "discounted_mask": True, "cuda": False}
    ref = ref_sdm(cfg).numpy()  # [1, 1, h, w]
    ours = np.asarray(dt.spatial_discounting_mask((16, 24), gamma=0.9))
    np.testing.assert_allclose(ours[0, :, :, 0], ref[0, 0], atol=1e-6)


def test_bbox2mask_shapes_and_support():
    key = jax.random.key(0)
    boxes = dt.random_bbox(key, (64, 64), (16, 16), margin=(4, 4),
                           batch_size=3, mask_batch_same=False)
    assert boxes.shape == (3, 4)
    assert (boxes[:, 0] >= 4).all() and (boxes[:, 0] + 16 <= 60).all()
    masks = dt.bbox2mask(key, boxes, 64, 64, max_delta_h=4, max_delta_w=4)
    assert masks.shape == (3, 64, 64, 1)
    m = np.asarray(masks)
    assert set(np.unique(m)) <= {0.0, 1.0}
    # jittered box area within [ (16-2*2)^2, 16^2 ]
    areas = m.sum(axis=(1, 2, 3))
    assert ((areas >= 12 * 12) & (areas <= 16 * 16)).all()


def test_mask_image_hole_and_mosaic():
    key = jax.random.key(1)
    x = jax.random.uniform(jax.random.key(2), (2, 32, 32, 3))
    boxes = dt.random_bbox(key, (32, 32), (8, 8), batch_size=2)
    holed, mask = dt.mask_image(key, x, boxes, (32, 32), mask_type="hole")
    assert np.asarray(holed)[np.asarray(mask).astype(bool).repeat(3, -1)].max() == 0.0
    mosaic, _ = dt.mask_image(key, x, boxes, (32, 32), mask_type="mosaic",
                              mosaic_unit_size=8)
    assert mosaic.shape == x.shape
    # outside the box, mosaic leaves pixels untouched
    outside = (1 - np.asarray(mask)).astype(bool).repeat(3, -1)
    np.testing.assert_allclose(np.asarray(mosaic)[outside],
                               np.asarray(x)[outside], atol=1e-6)


def test_local_patch():
    x = jnp.arange(2 * 8 * 8 * 1, dtype=jnp.float32).reshape(2, 8, 8, 1)
    boxes = [(1, 2, 3, 4), (0, 0, 3, 4)]
    patches = dt.local_patch(x, boxes)
    assert patches.shape == (2, 3, 4, 1)
    np.testing.assert_array_equal(np.asarray(patches[0]),
                                  np.asarray(x[0, 1:4, 2:6]))


def test_extract_image_patches_vs_reference(reference_path):
    import torch
    from condition.dps_utils.tools import extract_image_patches as ref_eip

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)  # ref is NCHW
    ref = ref_eip(torch.tensor(x), ksizes=[3, 3], strides=[2, 2],
                  rates=[1, 1], padding="same").numpy()  # [B, C*kh*kw, L]
    ours = dt.extract_image_patches(jnp.asarray(x.transpose(0, 2, 3, 1)),
                                    (3, 3), (2, 2), (1, 1), "same")
    B, nH, nW, D = ours.shape
    # ref layout: [B, C*kh*kw, nH*nW] with channel-major patch dim;
    # ours: [B, nH, nW, kh*kw*C] with (kh, kw, c) patch order
    ours_cmajor = np.asarray(ours).reshape(B, nH * nW, 3 * 3, 3)
    ours_cmajor = ours_cmajor.transpose(0, 3, 2, 1).reshape(B, 3 * 3 * 3,
                                                            nH * nW)
    np.testing.assert_allclose(ours_cmajor, ref, atol=1e-6)


def test_fastmri_fft2c_roundtrip_and_parity(reference_path):
    import torch
    from condition.dps_utils.fastmri_utils import fft2c_new, ifft2c_new

    rng = np.random.RandomState(1)
    x = rng.randn(2, 16, 16, 2).astype(np.float32)
    ref = fft2c_new(torch.tensor(x)).numpy()
    ours = np.asarray(dt.fft2c(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    back = np.asarray(dt.ifft2c(dt.fft2c(jnp.asarray(x))))
    np.testing.assert_allclose(back, x, atol=1e-5)
    ref_i = ifft2c_new(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(dt.ifft2c(jnp.asarray(x))), ref_i,
                               atol=1e-5)


def test_normalize_helpers():
    x = np.array([[1.0, 3.0], [2.0, 5.0]])
    n = dt.normalize_np(x)
    assert n.min() == 0.0 and n.max() == 1.0
    chw = np.zeros((3, 4, 4))
    chw[0] = 1.0
    out = dt.clear_color(jnp.asarray(chw))
    assert out.shape == (4, 4, 3)


# ---------------------------------------------------------------------------
# img_utils leftovers: fold/unfold, thresholding, TV, penalty masks
# ---------------------------------------------------------------------------


def test_unfold_fold_matches_torch(reference_path):
    import torch
    import torch.nn as nn
    from kdip_tpu.ops import dps_tools as dt

    rng = np.random.RandomState(0)
    x = rng.rand(2, 16, 16, 3).astype(np.float32)
    patches = np.asarray(dt.unfold_patches(jnp.asarray(x), 8, 4))
    # torch Unfolder (ref: img_utils.py:104-116) on NCHW
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    unfold = nn.Unfold(8, stride=4)
    dim = (16 - 8) // 4 + 1
    # reshape_patch handles B=1; compare patch contents per batch item
    for b in range(2):
        p1d = unfold(xt[b:b + 1])  # [1, C*k*k, L]
        want = (p1d.transpose(0, 2).squeeze()
                .view(dim * dim, 3, 8, 8).numpy())
        np.testing.assert_allclose(
            patches[b].transpose(0, 3, 1, 2), want, atol=1e-6)

    # fold: overlap-sum (torch nn.Fold semantics)
    folded = np.asarray(dt.fold_patches(jnp.asarray(patches), 16, 4))
    fold = nn.Fold(16, 8, stride=4)
    for b in range(2):
        p1d = unfold(xt[b:b + 1])
        want = fold(p1d).squeeze(0).numpy()
        np.testing.assert_allclose(folded[b].transpose(2, 0, 1), want,
                                   atol=1e-5)

    # fold_unfold average-reassembly is the identity
    _, back = dt.fold_unfold(jnp.asarray(x), 8, 4)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-5)


def test_dynamic_thresholding_matches_reference_semantics():
    from kdip_tpu.ops import dps_tools as dt

    rng = np.random.RandomState(1)
    img = rng.randn(4, 4, 3) * 2
    got = np.asarray(dt.dynamic_thresholding(jnp.asarray(img), s=0.9))
    scaling = np.quantile(np.abs(img), 0.9)
    want = np.clip(img * scaling, -1, 1)  # ref composes normalize (multiply)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_tv_and_penalty_mask(reference_path):
    import torch
    from kdip_tpu.ops import dps_tools as dt
    from condition.dps_utils import img_utils as ref

    rng = np.random.RandomState(2)
    x = rng.rand(1, 8, 8, 3).astype(np.float32)
    got = float(dt.total_variation_loss(jnp.asarray(x), 0.5))
    want = float(ref.total_variation_loss(
        torch.tensor(x.transpose(0, 3, 1, 2)), 0.5))
    assert got == pytest.approx(want, abs=1e-6)

    np.testing.assert_allclose(dt.create_gaussian(7, 2.0),
                               ref.create_gaussian(7, 2.0), atol=1e-10)
    np.testing.assert_allclose(dt.create_penalty_mask(11, 3.0),
                               ref.create_penalty_mask(11, 3.0), atol=1e-10)


def test_center_crop_matches_reference(reference_path):
    from kdip_tpu.ops import dps_tools as dt
    from condition.dps_utils import img_utils as ref

    rng = np.random.RandomState(3)
    img = rng.rand(11, 14, 3)
    np.testing.assert_array_equal(dt.center_crop(img, 6, 5),
                                  ref.center_crop(img, 6, 5))
    np.testing.assert_array_equal(dt.center_crop(img),
                                  ref.center_crop(img))


def test_flow_visualization_matches_reference(reference_path):
    from condition.dps_utils import tools as ref
    from kdip_tpu.ops import dps_tools as dt

    np.testing.assert_array_equal(dt.make_color_wheel(),
                                  ref.make_color_wheel())

    rng = np.random.RandomState(0)
    flow = rng.randn(2, 8, 8, 2) * 3
    got = dt.flow_to_image(flow.copy())
    want = ref.flow_to_image(flow.copy())
    np.testing.assert_array_equal(got, want)

    iflow = rng.randint(0, 8, (1, 8, 8, 2))
    np.testing.assert_array_equal(dt.highlight_flow(iflow.copy()),
                                  ref.highlight_flow(iflow.copy()))


def test_reducers_match_reference(reference_path):
    import torch
    from condition.dps_utils import tools as ref
    from kdip_tpu.ops import dps_tools as dt

    rng = np.random.RandomState(1)
    x = rng.rand(3, 4, 5).astype(np.float32)
    for axes in ([1], [0, 2]):
        np.testing.assert_allclose(
            np.asarray(dt.reduce_mean(jnp.asarray(x), axes, True)),
            ref.reduce_mean(torch.tensor(x), axes, True).numpy(), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(dt.reduce_sum(jnp.asarray(x), axes, True)),
            ref.reduce_sum(torch.tensor(x), axes, True).numpy(), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(dt.reduce_std(jnp.asarray(x), axes, True)),
            ref.reduce_std(torch.tensor(x), axes, True).numpy(), atol=1e-5)


def test_get_model_list(tmp_path):
    from kdip_tpu.ops import dps_tools as dt

    assert dt.get_model_list(str(tmp_path / "nope"), "gen") is None
    (tmp_path / "gen_00000010.pt").write_bytes(b"")
    (tmp_path / "gen_00000020.pt").write_bytes(b"")
    (tmp_path / "other.txt").write_bytes(b"")
    assert dt.get_model_list(str(tmp_path), "gen").endswith("gen_00000020.pt")
    assert dt.get_model_list(str(tmp_path), "gen", 10).endswith(
        "gen_00000010.pt")
