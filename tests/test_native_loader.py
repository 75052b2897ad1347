"""Native C++ input pipeline (kdip_tpu/native/loader.cc) vs the Python path.

The native loader must be a drop-in for the synchronous PIL pipeline
(ref counterpart: torch DataLoader workers, train_openai.py:43,67 and
guided_diffusion/image_datasets.py:96-108): bit-identical batches for PNG
inputs (loader.cc reimplements Pillow's fixed-point Resample.c), <=1 LSB
for JPEG (libjpeg ISLOW vs PIL's bundled libjpeg-turbo), same ordering,
same RNG consumption, graceful Python fallback for exotic formats.
"""

import numpy as np
import pytest

from kdip_tpu import native
from kdip_tpu.data import FolderOfImages, ImageDataset, center_crop_arr

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native loader unavailable: {native.build_error()}")


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    """Folder of deterministic PNGs with FFHQ-like uniform 64x64 size."""
    from PIL import Image
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for i in range(10):
        arr = rng.randint(0, 256, (64, 64, 3), np.uint8)
        Image.fromarray(arr).save(root / f"img_{i:03d}.png")
    return root


@pytest.fixture(scope="module")
def varied_dir(tmp_path_factory):
    """Folder of larger, non-square PNGs for the resize/crop chains."""
    from PIL import Image
    root = tmp_path_factory.mktemp("varied")
    rng = np.random.RandomState(1)
    for i, (h, w) in enumerate([(160, 120), (130, 200), (256, 256),
                                (97, 143)]):
        arr = rng.randint(0, 256, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(root / f"v_{i}.png")
    return root


def test_probe_size(image_dir):
    path = sorted(image_dir.glob("*.png"))[0]
    assert native.probe_size(path) == (64, 64)


def test_folder_square_resize_bit_exact(varied_dir):
    """FolderOfImages(size=48): LANCZOS square resize, native == Python."""
    ds_py = FolderOfImages(varied_dir, size=48)
    ds_nat = FolderOfImages(varied_dir, size=48)
    py = list(ds_py.batches(2))
    nat = list(ds_nat.batches(2, num_workers=3))
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        np.testing.assert_array_equal(a, b)


def test_adm_center_crop_bit_exact(varied_dir):
    """ImageDataset center-crop chain (BOX halving + BICUBIC + crop),
    native == Python, including the odd-dimension rounding."""
    ds_py = ImageDataset(varied_dir, image_size=48)
    ds_nat = ImageDataset(varied_dir, image_size=48)
    py = list(ds_py.batches(3))
    nat = list(ds_nat.batches(3, num_workers=2))
    for a, b in zip(py, nat):
        np.testing.assert_array_equal(a, b)


def test_adm_random_crop_same_rng_draws(varied_dir):
    """random_crop draws (scale, offsets) must consume the shared
    RandomState in the same order as random_crop_arr, so a native epoch
    equals a Python epoch bit-for-bit."""
    ds_py = ImageDataset(varied_dir, image_size=32, random_crop=True, seed=7)
    ds_nat = ImageDataset(varied_dir, image_size=32, random_crop=True, seed=7)
    py = list(ds_py.batches(2, shuffle=True, seed=3))
    nat = list(ds_nat.batches(2, shuffle=True, seed=3, num_workers=4))
    assert len(py) == len(nat) > 0
    for a, b in zip(py, nat):
        np.testing.assert_array_equal(a, b)


def test_jpeg_decode_within_one_lsb(tmp_path):
    from PIL import Image
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (80, 112, 3), np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(arr).save(p, quality=90)
    ref = np.asarray(Image.open(p).convert("RGB"), np.float32)
    out = np.empty((80, 112, 3), np.float32)
    with native.NativeLoader(1) as L:
        L.submit(native.JobSpec(p, norm_mode=0), 0, out)
        tag, err, hw = L.wait()
    assert err is None and hw == (80, 112)
    got = (out + 1.0) * 127.5
    assert np.abs(got - ref).max() <= 1.0 + 1e-3


def test_gray_and_palette_png_match_pil_convert(tmp_path):
    """Gray and palette PNGs take PIL's convert('RGB') semantics."""
    from PIL import Image
    rng = np.random.RandomState(4)
    gray = rng.randint(0, 256, (40, 40), np.uint8)
    pg = tmp_path / "g.png"
    Image.fromarray(gray, mode="L").save(pg)
    pal = Image.fromarray(rng.randint(0, 256, (40, 40, 3), np.uint8)).convert(
        "P", palette=Image.ADAPTIVE)
    pp = tmp_path / "p.png"
    pal.save(pp)
    for p in (pg, pp):
        ref = np.asarray(Image.open(p).convert("RGB"), np.float32) / 127.5 - 1
        out = np.empty(ref.shape, np.float32)
        with native.NativeLoader(1) as L:
            L.submit(native.JobSpec(p, norm_mode=0), 0, out)
            _, err, _ = L.wait()
        assert err is None
        np.testing.assert_allclose(out, ref, atol=1e-6)


def test_ordering_and_drop_last(image_dir):
    """Many workers, small batches: output order must follow the index
    order regardless of decode completion order; drop_last trims the tail
    exactly like the Python path."""
    ds = FolderOfImages(image_dir, size=64)
    py = list(FolderOfImages(image_dir, size=64).batches(3, drop_last=True))
    nat = list(ds.batches(3, drop_last=True, num_workers=8))
    assert len(nat) == len(py) == 3
    for a, b in zip(py, nat):
        np.testing.assert_array_equal(a, b)


def test_shuffle_matches_python(image_dir):
    py = list(FolderOfImages(image_dir, size=64).batches(4, shuffle=True,
                                                         seed=11))
    nat = list(FolderOfImages(image_dir, size=64).batches(
        4, shuffle=True, seed=11, num_workers=4))
    for a, b in zip(py, nat):
        np.testing.assert_array_equal(a, b)


def test_mixed_format_folder_falls_back(image_dir, tmp_path):
    """A folder containing a format the native path doesn't decode (bmp)
    silently uses the Python pipeline with identical results."""
    from PIL import Image
    import shutil
    root = tmp_path / "mixed"
    shutil.copytree(image_dir, root)
    rng = np.random.RandomState(5)
    Image.fromarray(rng.randint(0, 256, (64, 64, 3), np.uint8)).save(
        root / "zz.bmp")
    ds = FolderOfImages(root, size=64)
    py = list(FolderOfImages(root, size=64).batches(4))
    nat = list(ds.batches(4, num_workers=2))
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        np.testing.assert_array_equal(a, b)


def test_corrupt_file_raises(tmp_path):
    p = tmp_path / "bad.png"
    p.write_bytes(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
    out = np.empty((8, 8, 3), np.float32)
    with native.NativeLoader(1) as L:
        L.submit(native.JobSpec(p, norm_mode=0), 0, out)
        _, err, _ = L.wait()
    assert err is not None and "png" in err


def test_transform_applied_after_native_load(varied_dir):
    """FolderOfImages.transform runs on the native batches too."""
    ds = FolderOfImages(varied_dir, size=32, transform=lambda a: a * 0.5)
    py = list(FolderOfImages(varied_dir, size=32,
                             transform=lambda a: a * 0.5).batches(2))
    nat = list(ds.batches(2, num_workers=2))
    for a, b in zip(py, nat):
        np.testing.assert_array_equal(a, b)


def test_cmyk_jpeg_per_item_pil_fallback(image_dir, tmp_path):
    """A CMYK JPEG (passes the .jpg suffix pre-check; the C++ decoder
    rejects it) must NOT abort the stream (ADVICE r3 #1): that one item is
    re-decoded via PIL into its batch slot, identical to the Python path."""
    from PIL import Image
    import shutil
    root = tmp_path / "with_cmyk"
    shutil.copytree(image_dir, root)
    rng = np.random.RandomState(7)
    cmyk = Image.fromarray(rng.randint(0, 256, (64, 64, 4), np.uint8), "CMYK")
    cmyk.save(root / "aa_cmyk.jpg")  # sorts first: lands mid-stream early
    py = list(FolderOfImages(root, size=64).batches(4))
    nat = list(FolderOfImages(root, size=64).batches(4, num_workers=4))
    assert len(py) == len(nat) == 3
    for a, b in zip(py, nat):
        np.testing.assert_array_equal(a, b)


def test_cmyk_jpeg_random_crop_fallback(image_dir, tmp_path):
    """Same per-item repair through ImageDataset's random-crop pipeline:
    the JobSpec's pre-drawn crop params are replayed by the PIL fallback."""
    from PIL import Image
    import shutil
    root = tmp_path / "rc_cmyk"
    shutil.copytree(image_dir, root)
    rng = np.random.RandomState(8)
    Image.fromarray(rng.randint(0, 256, (80, 96, 4), np.uint8),
                    "CMYK").save(root / "mm_cmyk.jpg")
    py = list(ImageDataset(root, 32, random_crop=True, seed=3).batches(3))
    nat = list(ImageDataset(root, 32, random_crop=True, seed=3).batches(
        3, num_workers=3))
    for a, b in zip(py, nat):
        np.testing.assert_array_equal(a, b)


def test_unprobeable_file_decoded_python_side(image_dir, tmp_path):
    """A .jpg whose header the native prober can't parse (BMP content):
    _native_spec decodes it in Python with the same RNG draw order, and
    the epoch still matches the synchronous path."""
    from PIL import Image
    import shutil
    root = tmp_path / "bmp_as_jpg"
    shutil.copytree(image_dir, root)
    rng = np.random.RandomState(9)
    Image.fromarray(rng.randint(0, 256, (70, 75, 3), np.uint8)).save(
        root / "kk.bmp")
    (root / "kk.bmp").rename(root / "kk.jpg")
    assert native.probe_size(root / "kk.jpg") is None
    py = list(ImageDataset(root, 32, random_crop=True, seed=4).batches(4))
    nat = list(ImageDataset(root, 32, random_crop=True, seed=4).batches(
        4, num_workers=2))
    for a, b in zip(py, nat):
        np.testing.assert_array_equal(a, b)


def test_rng_state_equal_after_full_epoch(image_dir):
    """Specs are now drawn lazily (ADVICE r3 #2); after a fully consumed
    epoch the dataset RNG state must match the synchronous path exactly,
    so the NEXT epoch's crops agree across num_workers settings."""
    a = ImageDataset(image_dir, 32, random_crop=True, seed=5)
    b = ImageDataset(image_dir, 32, random_crop=True, seed=5)
    e1a = list(a.batches(3))
    e1b = list(b.batches(3, num_workers=4))
    sa, sb = a.rng.get_state(), b.rng.get_state()
    assert sa[0] == sb[0] and (sa[1] == sb[1]).all() and sa[2:] == sb[2:]
    for x, y in zip(a.batches(3), b.batches(3, num_workers=4)):
        np.testing.assert_array_equal(x, y)
    for x, y in zip(e1a, e1b):
        np.testing.assert_array_equal(x, y)


def test_probe_size_survives_marker_bloat(image_dir, tmp_path):
    """The probe reads a bounded prefix (ADVICE r3 #4); a JPEG with >64KB
    of APPn segments before SOF must still probe via the full-file retry."""
    from PIL import Image
    rng = np.random.RandomState(10)
    src = tmp_path / "plain.jpg"
    Image.fromarray(rng.randint(0, 256, (48, 56, 3), np.uint8)).save(src)
    data = src.read_bytes()
    assert data[:2] == b"\xff\xd8"
    seg = b"\xff\xe2" + (0xFFFB + 2).to_bytes(2, "big") + b"\x00" * 0xFFFB
    bloated = tmp_path / "bloated.jpg"
    bloated.write_bytes(data[:2] + seg * 2 + data[2:])  # ~128KB of APP2
    assert native.probe_size(bloated) == (56, 48)
    # and the plain file must probe from the prefix alone (same answer)
    assert native.probe_size(src) == (56, 48)
