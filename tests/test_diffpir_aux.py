"""Parity tests for the DiffPIR aux surface: MATLAB imresize / color /
metrics (ops/image_utils), boundary-artifact reduction (ops/deblur),
trajectory blur synthesis (ops/kernels), Shepard inpainting init
(ops/inpaint) — each against the reference implementation as oracle."""

import numpy as np
import pytest

from kdip_tpu.ops import deblur, image_utils, inpaint, kernels


# ---------------------------------------------------------------------------
# image_utils
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("scale", [0.5, 0.25, 2.0, 1.0 / 3.0, 1.5])
@pytest.mark.parametrize("chans", [None, 3])
def test_imresize_matches_reference(reference_path, scale, chans):
    from condition.diffpir_utils import utils_image as ref

    rng = np.random.RandomState(0)
    shape = (24, 20) if chans is None else (24, 20, chans)
    img = rng.rand(*shape).astype(np.float32)
    want = ref.imresize_np(img.copy(), scale)
    got = image_utils.imresize_np(img, scale)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)


def test_imresize_jnp_matches_numpy():
    import jax.numpy as jnp
    rng = np.random.RandomState(1)
    img = rng.rand(16, 16, 3).astype(np.float32)
    a = image_utils.imresize_np(img, 0.5)
    b = np.asarray(image_utils.imresize(jnp.asarray(img), 0.5))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.parametrize("dtype", ["uint8", "float"])
def test_ycbcr_matches_reference(reference_path, dtype):
    from condition.diffpir_utils import utils_image as ref

    rng = np.random.RandomState(2)
    if dtype == "uint8":
        img = rng.randint(0, 256, (8, 9, 3)).astype(np.uint8)
    else:
        img = rng.rand(8, 9, 3).astype(np.float64)

    for only_y in (True, False):
        np.testing.assert_allclose(
            image_utils.rgb2ycbcr(img.copy(), only_y),
            ref.rgb2ycbcr(img.copy(), only_y), atol=1e-5)
        np.testing.assert_allclose(
            image_utils.bgr2ycbcr(img.copy(), only_y),
            ref.bgr2ycbcr(img.copy(), only_y), atol=1e-5)
    np.testing.assert_allclose(image_utils.ycbcr2rgb(img.copy()),
                               ref.ycbcr2rgb(img.copy()), atol=1e-5)


def test_conversions_and_crops(reference_path):
    from condition.diffpir_utils import utils_image as ref

    rng = np.random.RandomState(3)
    u8 = rng.randint(0, 256, (13, 11, 3)).astype(np.uint8)
    f = rng.rand(13, 11, 3).astype(np.float32)
    np.testing.assert_allclose(image_utils.uint2single(u8),
                               ref.uint2single(u8))
    np.testing.assert_array_equal(image_utils.single2uint(f),
                                  ref.single2uint(f))
    np.testing.assert_array_equal(image_utils.modcrop(u8, 4),
                                  ref.modcrop(u8, 4))
    np.testing.assert_array_equal(image_utils.shave(u8, 2),
                                  ref.shave(u8, 2))


def test_psnr_ssim_match_reference(reference_path):
    from condition.diffpir_utils import utils_image as ref

    rng = np.random.RandomState(4)
    a = rng.randint(0, 256, (32, 32, 3)).astype(np.float64)
    b = np.clip(a + rng.randn(32, 32, 3) * 12, 0, 255)
    assert image_utils.calculate_psnr(a, b, border=2) == pytest.approx(
        ref.calculate_psnr(a, b, border=2), abs=1e-8)
    try:
        want = ref.calculate_ssim(a, b, border=2)
    except ImportError:
        pytest.skip("cv2 unavailable for the reference oracle")
    assert image_utils.calculate_ssim(a, b, border=2) == pytest.approx(
        want, abs=1e-6)
    # gray path
    assert image_utils.calculate_ssim(a[..., 0], b[..., 0]) == pytest.approx(
        ref.calculate_ssim(a[..., 0], b[..., 0]), abs=1e-6)


# ---------------------------------------------------------------------------
# deblur (wrap_boundary_liu & co.)
# ---------------------------------------------------------------------------

def test_dst1_matches_scipy():
    from scipy import fftpack
    rng = np.random.RandomState(5)
    x = rng.randn(7, 9)
    np.testing.assert_allclose(np.asarray(deblur.dst1(x, axis=1)),
                               fftpack.dst(x, type=1, axis=1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(deblur.dst1(x, axis=0)),
                               fftpack.dst(x, type=1, axis=0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(deblur.idst1(deblur.dst1(x))), x,
                               atol=1e-6)


def test_opt_fft_size_matches_reference(reference_path):
    from condition.diffpir_utils import utils_deblur as ref
    n = [1, 2, 17, 31, 100, 257, 511, 1023, 2048]
    np.testing.assert_array_equal(deblur.opt_fft_size(list(n)),
                                  ref.opt_fft_size(list(n)))


def test_psf2otf_otf2psf_match_reference(reference_path):
    from condition.diffpir_utils import utils_deblur as ref
    rng = np.random.RandomState(6)
    psf = rng.rand(7, 7)
    psf /= psf.sum()
    ours = deblur.psf2otf(psf, (16, 16))
    want = ref.psf2otf(psf, (16, 16))
    np.testing.assert_allclose(ours, want, atol=1e-12)
    back = deblur.otf2psf(ours, (7, 7))
    wback = ref.otf2psf(want, (7, 7))
    np.testing.assert_allclose(back, wback, atol=1e-12)
    # exact roundtrip holds at matching sizes (the centered crop of an
    # odd-sized psf out of an even-sized otf is offset by construction)
    np.testing.assert_allclose(deblur.otf2psf(deblur.psf2otf(psf)), psf,
                               atol=1e-12)


def test_solve_min_laplacian_matches_reference(reference_path):
    from condition.diffpir_utils import utils_deblur as ref
    rng = np.random.RandomState(7)
    b = rng.rand(9, 12)
    ours = np.asarray(deblur.solve_min_laplacian(b.copy()))
    want = ref.solve_min_laplacian(b.copy())
    np.testing.assert_allclose(ours, want, atol=1e-5)  # fp32 on-device path


@pytest.mark.parametrize("chans", [None, 3])
def test_wrap_boundary_liu_matches_reference(reference_path, chans):
    from condition.diffpir_utils import utils_deblur as ref
    rng = np.random.RandomState(8)
    shape = (20, 24) if chans is None else (20, 24, chans)
    img = rng.rand(*shape)
    target = [28, 32]
    ours = np.asarray(deblur.wrap_boundary_liu(img.copy(), target))
    want = ref.wrap_boundary_liu(img.copy(), target)
    assert ours.shape == np.asarray(want).shape
    np.testing.assert_allclose(ours, want, atol=1e-5)  # fp32 on-device path


# ---------------------------------------------------------------------------
# trajectory blur synthesis
# ---------------------------------------------------------------------------

def test_blurkernel_synthesis_matches_reference_per_seed(reference_path):
    from condition.diffpir_utils import utils_deblur as ref
    for seed in (0, 1, 42):
        np.random.seed(seed)
        want = ref.blurkernel_synthesis(h=37)
        got = kernels.blurkernel_synthesis(h=37, seed=seed)
        np.testing.assert_allclose(got, want, atol=1e-12)


def test_fspecial_new_filters(reference_path):
    from condition.diffpir_utils import utils_deblur as ref
    np.testing.assert_array_equal(kernels.fspecial("prewitt"),
                                  ref.fspecial("prewitt"))
    np.testing.assert_array_equal(kernels.fspecial("sobel"),
                                  ref.fspecial("sobel"))
    np.testing.assert_allclose(kernels.fspecial_gauss(3, 1),
                               ref.fspecial_gauss(3, 1), atol=1e-12)
    # motion: the reference raises NotImplemented; ours implements the
    # MATLAB semantics — check the invariants instead.
    h = kernels.fspecial_motion(9, 0)
    assert h.sum() == pytest.approx(1.0, abs=1e-6)
    assert h.shape[0] % 2 == 1 and h.shape[1] % 2 == 1
    mid = h.shape[0] // 2
    assert h[mid].sum() == pytest.approx(1.0, abs=1e-6)  # horizontal line
    h45 = kernels.fspecial_motion(9, 45)
    assert h45.sum() == pytest.approx(1.0, abs=1e-6)
    np.testing.assert_allclose(h45, np.rot90(h45, 2), atol=1e-12)  # symmetric


# ---------------------------------------------------------------------------
# inpaint init
# ---------------------------------------------------------------------------

def test_get_rho_sigma_matches_reference(reference_path):
    from condition.diffpir_utils import utils_inpaint as ref
    rhos, sigmas = inpaint.get_rho_sigma(sigma=0.05, iter_num=12,
                                         model_sigma2=1.7)
    want_rhos, want_sigmas = ref.get_rho_sigma(sigma=0.05, iter_num=12,
                                               modelSigma2=1.7)
    np.testing.assert_allclose(rhos, np.asarray(want_rhos), atol=1e-12)
    np.testing.assert_allclose(sigmas, want_sigmas, atol=1e-12)


@pytest.mark.parametrize("chans", [None, 3])
def test_shepard_initialize_matches_reference(reference_path, chans):
    from condition.diffpir_utils import utils_inpaint as ref
    rng = np.random.RandomState(9)
    shape = (12, 14) if chans is None else (12, 14, chans)
    img = rng.rand(*shape)
    mask = (rng.rand(12, 14) > 0.5).astype(np.float64)
    want = ref.shepard_initialize(img.copy(), mask.copy(), window=5)
    got = np.asarray(inpaint.shepard_initialize(img, mask, window=5))
    np.testing.assert_allclose(got, want, atol=1e-6)  # fp32 on-device path


def test_wrap_boundary_reduces_deconvolution_artifacts():
    """Integration: deconvolving a non-periodic blurred image circularly
    rings at the borders; wrap_boundary_liu padding to an FFT-friendly size
    (the reference's classic-deblur preprocessing) suppresses it."""
    from scipy import ndimage

    rng = np.random.RandomState(0)
    h = w = 48
    # strongly non-periodic content: a diagonal ramp + texture
    yy, xx = np.mgrid[0:h, 0:w]
    img = (xx + yy) / (h + w) + 0.1 * rng.rand(h, w)
    psf = kernels.fspecial_gaussian(9, 1.5)
    # real-world (non-circular) blur
    blurred = ndimage.convolve(img, psf, mode="nearest")

    def wiener_circ(y, shape, eps=1e-3):
        otf = deblur.psf2otf(psf, shape)
        num = np.conj(otf) * np.fft.fft2(y)
        return np.real(np.fft.ifft2(num / (np.abs(otf) ** 2 + eps)))

    naive = wiener_circ(blurred, (h, w))

    target = deblur.opt_fft_size([h + psf.shape[0] - 1,
                                  w + psf.shape[1] - 1]).astype(int)
    padded = np.asarray(deblur.wrap_boundary_liu(blurred, target))
    dewrapped = wiener_circ(padded, tuple(target))[:h, :w]

    border = np.ones((h, w), dtype=bool)
    border[8:-8, 8:-8] = False
    err_naive = np.abs(naive - img)[border].mean()
    err_wrap = np.abs(dewrapped - img)[border].mean()
    assert err_wrap < 0.5 * err_naive, (err_naive, err_wrap)


def test_converters_match_reference(reference_path):
    """The full numpy<->tensor converter surface vs the reference's torch
    versions (ref: utils_image.py:205-310) — same shapes, scaling, layouts."""
    import torch
    from condition.diffpir_utils import utils_image as ref

    rng = np.random.RandomState(0)
    u8 = (rng.rand(6, 8, 3) * 255).astype(np.uint8)
    u8g = u8[:, :, 0]
    f32 = rng.rand(6, 8, 3).astype(np.float32)
    f5 = rng.rand(6, 8, 3, 4).astype(np.float32)
    f3t = rng.rand(6, 8, 4).astype(np.float32)

    pairs = [
        (image_utils.uint2tensor4(u8), ref.uint2tensor4(u8)),
        (image_utils.uint2tensor4(u8g), ref.uint2tensor4(u8g)),
        (image_utils.uint2tensor3(u8), ref.uint2tensor3(u8)),
        (image_utils.single2tensor4(f32), ref.single2tensor4(f32)),
        (image_utils.single2tensor5(f5), ref.single2tensor5(f5)),
        (image_utils.single32tensor5(f3t), ref.single32tensor5(f3t)),
        (image_utils.single42tensor4(f5), ref.single42tensor4(f5)),
        (image_utils.single2tensor3(f32), ref.single2tensor3(f32)),
        (image_utils.single2tensor2(f32[:, :, :1]),
         ref.single2tensor2(f32[:, :, :1])),
    ]
    for ours, want in pairs:
        np.testing.assert_allclose(np.asarray(ours), want.numpy(), atol=1e-6)

    t4 = torch.rand(1, 3, 6, 8) * 1.4 - 0.2
    np.testing.assert_array_equal(image_utils.tensor2uint(t4.numpy()),
                                  ref.tensor2uint(t4))
    np.testing.assert_allclose(image_utils.tensor2single(t4.numpy()),
                               ref.tensor2single(t4), atol=1e-7)
    t2 = torch.rand(6, 8)
    np.testing.assert_allclose(image_utils.tensor2single3(t2.numpy()),
                               ref.tensor2single3(t2), atol=1e-7)

    for shape in [(3, 6, 8), (6, 8)]:
        t = torch.rand(*shape) * 1.2 - 0.1
        np.testing.assert_array_equal(image_utils.tensor2img(t.numpy()),
                                      ref.tensor2img(t.clone()))
    # 4D branch tiles a make_grid mosaic. torchvision is absent here (the
    # shim stubs it), so the reference branch cannot run; check our tiling
    # against an explicit hand-built mosaic with make_grid's geometry
    # (nrow=floor(sqrt(B)) columns, 2px zero padding, row-major fill).
    t = (torch.rand(4, 3, 6, 8)).numpy()
    got = image_utils.tensor2img(t)
    assert got.shape == (2 + 2 * (6 + 2), 2 + 2 * (8 + 2), 3)
    for k in range(4):
        y, x = divmod(k, 2)
        cell = got[2 + y * 8: 2 + y * 8 + 6, 2 + x * 10: 2 + x * 10 + 8]
        want = (t[k][[2, 1, 0]].transpose(1, 2, 0).clip(0, 1)
                * 255.0).round().astype(np.uint8)
        np.testing.assert_array_equal(cell, want)


def test_augmentations_match_reference(reference_path):
    """All 8 dihedral modes of every augment variant
    (ref: utils_image.py:316-426)."""
    import torch
    from condition.diffpir_utils import utils_image as ref

    rng = np.random.RandomState(1)
    img = rng.rand(6, 8, 3).astype(np.float32)
    t4 = torch.rand(2, 3, 6, 8)
    t3 = torch.rand(3, 6, 8)
    for mode in range(8):
        np.testing.assert_array_equal(image_utils.augment_img(img, mode),
                                      ref.augment_img(img, mode))
        np.testing.assert_array_equal(image_utils.augment_img_np3(img, mode),
                                      ref.augment_img_np3(img, mode))
        np.testing.assert_allclose(
            np.asarray(image_utils.augment_img_tensor4(t4.numpy(), mode)),
            ref.augment_img_tensor4(t4, mode).numpy(), atol=1e-7)
        for t in (t3, t4):
            np.testing.assert_allclose(
                np.asarray(image_utils.augment_img_tensor(t.numpy(), mode)),
                ref.augment_img_tensor(t, mode).numpy(), atol=1e-7)

    # augment_imgs draws 3 bernoullis; replay the reference's global-random
    # draws through a seeded shim for equality
    import random as pyrandom
    pyrandom.seed(7)
    want = ref.augment_imgs([img, img[::-1].copy()])
    pyrandom.seed(7)
    got = image_utils.augment_imgs([img, img[::-1].copy()])
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_fs_helpers_and_channel_convert(reference_path, tmp_path):
    """File-system surface + channel_convert vs the reference where the
    reference is importable (cv2-free paths)."""
    from condition.diffpir_utils import utils_image as ref
    from PIL import Image

    assert image_utils.is_image_file("a.png") and \
        not image_utils.is_image_file("a.txt")
    assert image_utils.IMG_EXTENSIONS == ref.IMG_EXTENSIONS

    d = tmp_path / "imgs" / "sub"
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray((rng.rand(4, 4, 3) * 255).astype(np.uint8)).save(
            d / f"{i}.png")
    (d / "notes.txt").write_text("x")
    paths = image_utils.get_image_paths(str(tmp_path / "imgs"))
    assert len(paths) == 2 and all(p.endswith(".png") for p in paths)
    assert image_utils.get_image_paths(None) is None
    assert paths == ref.get_image_paths(str(tmp_path / "imgs"))

    out = tmp_path / "made" / "deep"
    image_utils.mkdirs([str(out)])
    assert out.is_dir()
    image_utils.mkdir_and_rename(str(out))   # archives + recreates
    assert out.is_dir()

    img = (rng.rand(4, 4, 3) * 255).astype(np.uint8)
    y_ours = image_utils.channel_convert(3, "y", [img])
    y_ref = ref.channel_convert(3, "y", [img])
    np.testing.assert_array_equal(y_ours[0], y_ref[0])
    # gray path: reference needs cv2 (absent) — check BT.601 weights directly
    g = image_utils.channel_convert(3, "gray", [img])[0]
    assert g.shape == (4, 4, 1)
    w = np.array([0.114, 0.587, 0.299])
    np.testing.assert_allclose(
        g[:, :, 0].astype(np.float64),
        (img.astype(np.float64) * w).sum(-1).astype(np.uint8), atol=1)

    # read_img: BGR float in [0,1]
    p = str(paths[0])
    got = image_utils.read_img(p)
    want = np.asarray(Image.open(p).convert("RGB"))[:, :, ::-1] / 255.0
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-6)

    # todevice places on a jax device
    import jax
    placed = image_utils.todevice([np.zeros((2, 2))])
    assert placed[0].devices() <= set(jax.devices())
