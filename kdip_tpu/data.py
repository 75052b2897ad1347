"""Datasets and augmentation (host-side input pipeline).

Equivalents of the reference's data surface:
- `FolderOfImages` (k_diffusion/utils.py:274-297): recursive image folder
  with no classes.
- `KarrasAugmentationPipeline` (k_diffusion/augmentation.py:34-86): the
  EDM non-leaky affine augmentation returning (aug_image, orig_image,
  9-dim conditioning vector).
- Sharded batching for a device mesh (replacing the reference's MPI-sharded
  ImageDataset, guided_diffusion/image_datasets.py:11-109).

The pipeline is host-side numpy/PIL (input pipelines feed the device;
augmentation math matches the reference, with scipy affine warp order=3).
"""

from __future__ import annotations

import math
import os
from functools import reduce
from pathlib import Path
from typing import Callable, Iterator, Optional, Tuple

import numpy as np

IMG_EXTENSIONS = {".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif",
                  ".tiff", ".webp"}


class FolderOfImages:
    """Recursive image folder dataset, no classes
    (ref: k_diffusion/utils.py:274-297). Returns [H, W, C] float arrays in
    [-1, 1] (NHWC; the reference returns CHW tensors)."""

    def __init__(self, root: str, transform: Optional[Callable] = None,
                 size: Optional[int] = None):
        self.root = Path(root)
        self.transform = transform
        self.size = size
        self.paths = sorted(p for p in self.root.rglob("*")
                            if p.suffix.lower() in IMG_EXTENSIONS)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx) -> Tuple[np.ndarray]:
        from PIL import Image
        with Image.open(self.paths[idx]) as img:
            img = img.convert("RGB")
            if self.size is not None:
                img = img.resize((self.size, self.size), Image.LANCZOS)
            arr = np.asarray(img, dtype=np.float32) / 255.0
        arr = arr * 2 - 1
        if self.transform is not None:
            arr = self.transform(arr)
        return (arr,)

    def batches(self, batch_size: int, drop_last: bool = False,
                shuffle: bool = False, seed: int = 0,
                num_workers: int = 0, prefetch: int = 2
                ) -> Iterator[np.ndarray]:
        """Yield [B, H, W, C] float batches.

        num_workers > 0 routes decoding through the native C++ loader
        (kdip_tpu.native, the counterpart of the reference's
        DataLoader(num_workers=...) worker pool, train_openai.py:67) with
        `prefetch` batches decoded ahead; batch contents are identical to
        the synchronous Python path — decode/resample in loader.cc
        reproduce PIL bit-for-bit and every RNG draw stays in Python in
        the same access order. Falls back to the Python path when the
        library can't build; an individual file the C++ decoder rejects
        (e.g. a CMYK JPEG) is re-decoded via PIL into its batch slot
        without aborting the stream."""
        order = np.arange(len(self))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        if num_workers > 0:
            batches = self._native_batches(order, batch_size, drop_last,
                                           num_workers, prefetch)
            if batches is not None:
                yield from batches
                return
        for i in range(0, len(order), batch_size):
            idxs = order[i:i + batch_size]
            if drop_last and len(idxs) < batch_size:
                return
            yield np.stack([self[j][0] for j in idxs])

    # -- native-loader integration -----------------------------------------

    def _native_supported(self) -> bool:
        from . import native
        return (all(p.suffix.lower() in native.NATIVE_SUFFIXES
                    for p in self.paths) and native.available())

    def _native_spec(self, idx: int):
        """JobSpec for item `idx`, drawing any per-item RNG exactly as the
        Python __getitem__ would. None = this dataset can't use the
        native path (e.g. unknown output size)."""
        from . import native
        if self.size is None:
            return None  # variable-size output; stacking is caller's risk
        return native.JobSpec(self.paths[idx], square_w=self.size,
                              square_h=self.size,
                              filter=native.FILTER_LANCZOS, norm_mode=1)

    def _native_out_shape(self):
        if self.size is None:
            return None
        return (self.size, self.size, 3)

    def _native_batches(self, order, batch_size, drop_last, num_workers,
                        prefetch):
        """Returns a generator or None (fall back to Python). Per-item RNG
        draws happen lazily inside `_native_spec`, in access order, as each
        batch is SUBMITTED — so item-level draws match the Python path
        draw-for-draw. Because submission runs `prefetch` batches ahead of
        consumption, abandoning the stream mid-epoch (e.g. a trainer's
        max_steps break) leaves `self.rng` advanced by up to `prefetch`
        batches relative to the synchronous path; batch CONTENTS are
        identical either way, and so is the RNG state after any fully
        consumed epoch."""
        from . import native
        out_shape = self._native_out_shape()
        if out_shape is None or not self._native_supported():
            return None

        def gen():
            stream = native.batched_pipeline(
                batch_size=batch_size, out_shape=out_shape,
                num_threads=num_workers, drop_last=drop_last,
                prefetch_batches=prefetch,
                spec_fn=lambda i: self._native_spec(order[i]),
                n_items=len(order))
            for arr in stream:
                if self.transform is not None:
                    arr = np.stack([self.transform(a) for a in arr])
                yield arr

        return gen()


def center_crop_arr(arr: np.ndarray, image_size: int) -> np.ndarray:
    """Downscale-then-center-crop (ref: guided_diffusion/image_datasets.py:
    126-147): halve with box filter while >= 2x target, then bicubic to
    target scale, then center crop. Input/output HWC uint8-or-float."""
    from PIL import Image
    img = Image.fromarray(arr.astype(np.uint8)) if arr.dtype != np.uint8 \
        else Image.fromarray(arr)
    while min(*img.size) >= 2 * image_size:
        img = img.resize(tuple(x // 2 for x in img.size), resample=Image.BOX)
    scale = image_size / min(*img.size)
    img = img.resize(tuple(round(x * scale) for x in img.size),
                     resample=Image.BICUBIC)
    out = np.array(img)
    crop_y = (out.shape[0] - image_size) // 2
    crop_x = (out.shape[1] - image_size) // 2
    return out[crop_y:crop_y + image_size, crop_x:crop_x + image_size]


def random_crop_arr(arr: np.ndarray, image_size: int,
                    min_crop_frac: float = 0.8, max_crop_frac: float = 1.0,
                    rng: Optional[np.random.RandomState] = None,
                    smaller_dim_size: Optional[int] = None) -> np.ndarray:
    """Random-scale crop (ref: guided_diffusion/image_datasets.py:150-167).

    `smaller_dim_size` injects a pre-drawn scale (the native path draws it
    before probing the header); when None it is drawn from `rng` here."""
    from PIL import Image
    rng = rng or np.random.RandomState()
    if smaller_dim_size is None:
        min_smaller = math.ceil(image_size / max_crop_frac)
        max_smaller = math.floor(image_size / min_crop_frac)
        smaller_dim_size = rng.randint(min_smaller, max_smaller + 1)
    img = Image.fromarray(arr.astype(np.uint8)) if arr.dtype != np.uint8 \
        else Image.fromarray(arr)
    while min(*img.size) >= 2 * smaller_dim_size:
        img = img.resize(tuple(x // 2 for x in img.size), resample=Image.BOX)
    scale = smaller_dim_size / min(*img.size)
    img = img.resize(tuple(round(x * scale) for x in img.size),
                     resample=Image.BICUBIC)
    out = np.array(img)
    crop_y = rng.randint(out.shape[0] - image_size + 1)
    crop_x = rng.randint(out.shape[1] - image_size + 1)
    return out[crop_y:crop_y + image_size, crop_x:crop_x + image_size]


class ImageDataset(FolderOfImages):
    """Class-conditional image dataset with crop modes
    (ref: guided_diffusion/image_datasets.py:11-124): class labels parsed
    from the filename prefix before the first underscore; per-shard slicing
    replaces MPI sharding."""

    def __init__(self, root: str, image_size: int, class_cond: bool = False,
                 random_crop: bool = False, shard: int = 0, num_shards: int = 1,
                 seed: int = 0):
        super().__init__(root)
        self.paths = self.paths[shard::num_shards]
        self.image_size = image_size
        self.random_crop = random_crop
        self.rng = np.random.RandomState(seed)
        self.classes = None
        if class_cond:
            names = [p.name.split("_")[0] for p in self.paths]
            sorted_classes = {c: i for i, c in enumerate(sorted(set(names)))}
            self.classes = np.array([sorted_classes[n] for n in names])

    def __getitem__(self, idx):
        from PIL import Image
        with Image.open(self.paths[idx]) as img:
            arr = np.asarray(img.convert("RGB"))
        if self.random_crop:
            arr = random_crop_arr(arr, self.image_size, rng=self.rng)
        else:
            arr = center_crop_arr(arr, self.image_size)
        arr = arr.astype(np.float32) / 127.5 - 1
        if self.classes is not None:
            return arr, int(self.classes[idx])
        return (arr,)

    def _native_out_shape(self):
        return (self.image_size, self.image_size, 3)

    def _native_spec(self, idx: int):
        """Replicates __getitem__'s pipeline for the native loader. For
        random crops the RNG draws (scale, crop offsets) happen here in
        the same order random_crop_arr would make them, using header-only
        probed dimensions + the same resize-size arithmetic. A file whose
        header the native prober can't read is decoded in Python right
        here (same draws: `smaller` above, then crop offsets inside
        random_crop_arr) and returned as a ready array."""
        from . import native
        from PIL import Image
        p = self.paths[idx]
        if not self.random_crop:
            return native.JobSpec(p, smaller_dim=self.image_size,
                                  crop_size=self.image_size, norm_mode=0)
        min_smaller = math.ceil(self.image_size / 1.0)   # max_crop_frac
        max_smaller = math.floor(self.image_size / 0.8)  # min_crop_frac
        smaller = int(self.rng.randint(min_smaller, max_smaller + 1))
        dims = native.probe_size(p)
        if dims is None:
            with Image.open(p) as img:
                arr = np.asarray(img.convert("RGB"))
            arr = random_crop_arr(arr, self.image_size, rng=self.rng,
                                  smaller_dim_size=smaller)
            return arr.astype(np.float32) / 127.5 - 1
        w, h = dims
        while min(w, h) >= 2 * smaller:
            w, h = w // 2, h // 2
        scale = smaller / min(w, h)
        nw, nh = round(w * scale), round(h * scale)
        crop_y = int(self.rng.randint(nh - self.image_size + 1))
        crop_x = int(self.rng.randint(nw - self.image_size + 1))
        return native.JobSpec(p, smaller_dim=smaller,
                              crop_size=self.image_size, crop_x=crop_x,
                              crop_y=crop_y, norm_mode=0)


# ---------------------------------------------------------------------------
# Karras augmentation (ref: k_diffusion/augmentation.py:13-86)
# ---------------------------------------------------------------------------

def _translate2d(tx, ty):
    return np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], np.float64)


def _scale2d(sx, sy):
    return np.array([[sx, 0, 0], [0, sy, 0], [0, 0, 1]], np.float64)


def _rotate2d(theta):
    return np.array([[math.cos(theta), math.sin(-theta), 0],
                     [math.sin(theta), math.cos(theta), 0],
                     [0, 0, 1]], np.float64)


class KarrasAugmentationPipeline:
    """EDM affine augmentation (ref: k_diffusion/augmentation.py:34-86).

    __call__(image_hwc_01, rng) -> (aug, orig, cond9), images in [-1, 1]
    NHWC-single ([H, W, C]). The 9-dim cond vector matches the reference
    ordering: [a0, a1, a2, cos(a3)-1, sin(a3), a5 cos(a4), a5 sin(a4), a6, a7].
    """

    def __init__(self, a_prob=0.12, a_scale=2 ** 0.2, a_aniso=2 ** 0.2,
                 a_trans=1 / 8):
        self.a_prob = a_prob
        self.a_scale = a_scale
        self.a_aniso = a_aniso
        self.a_trans = a_trans

    def __call__(self, image: np.ndarray, rng: Optional[np.random.RandomState] = None):
        if rng is None:
            rng = np.random.RandomState()
        if image.ndim == 2:
            image = image[..., None]
        h, w = image.shape[:2]
        mats = [_translate2d(h / 2 - 0.5, w / 2 - 0.5)]

        a0 = float(rng.randint(2))
        mats.append(_scale2d(1 - 2 * a0, 1))
        a1 = float(rng.randint(2)) * float(rng.rand() < self.a_prob)
        mats.append(_scale2d(1, 1 - 2 * a1))
        a2 = float(rng.randn()) * float(rng.rand() < self.a_prob)
        mats.append(_scale2d(self.a_scale ** a2, self.a_scale ** a2))
        a3 = float(rng.rand() * 2 * math.pi - math.pi) * float(rng.rand() < self.a_prob)
        mats.append(_rotate2d(-a3))
        do4 = float(rng.rand() < self.a_prob)
        a4 = float(rng.rand() * 2 * math.pi - math.pi) * do4
        a5 = float(rng.randn()) * do4
        mats.append(_rotate2d(a4))
        mats.append(_scale2d(self.a_aniso ** a5, self.a_aniso ** -a5))
        mats.append(_rotate2d(-a4))
        do6 = float(rng.rand() < self.a_prob)
        a6 = float(rng.randn()) * do6
        a7 = float(rng.randn()) * do6
        mats.append(_translate2d(self.a_trans * w * a6, self.a_trans * h * a7))

        mats.append(_translate2d(-h / 2 + 0.5, -w / 2 + 0.5))
        mat = reduce(np.matmul, mats)
        cond = np.array([a0, a1, a2, math.cos(a3) - 1, math.sin(a3),
                         a5 * math.cos(a4), a5 * math.sin(a4), a6, a7],
                        np.float32)

        image01 = (image + 1) / 2 if image.min() < 0 else image
        aug = self._warp(image01, mat)
        orig = image01 * 2 - 1
        aug = aug * 2 - 1
        return aug.astype(np.float32), orig.astype(np.float32), cond

    @staticmethod
    def _warp(image01: np.ndarray, mat: np.ndarray) -> np.ndarray:
        """Affine warp with cubic interpolation and reflect boundary
        (ref: augmentation.py:82-83 skimage.transform.warp order=3
        mode='reflect'). Uses scipy.ndimage; coordinate convention matches
        skimage's AffineTransform (x = cols, y = rows)."""
        from scipy import ndimage
        # skimage warp with tf.inverse maps output coords through mat^{-1};
        # AffineTransform matrices act on (x, y, 1) = (col, row, 1).
        inv = np.linalg.inv(mat)
        # convert xy-convention matrix to row/col for ndimage
        swap = np.array([[0, 1, 0], [1, 0, 0], [0, 0, 1]], np.float64)
        m_rc = swap @ inv @ swap
        out = np.empty_like(image01)
        for c in range(image01.shape[-1]):
            out[..., c] = ndimage.affine_transform(
                image01[..., c], m_rc[:2, :2], offset=m_rc[:2, 2], order=3,
                mode="reflect", prefilter=True)
        return out


def augment_batch(pipeline: KarrasAugmentationPipeline, images: np.ndarray,
                  seed: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Applies the augmentation per-image over a [B, H, W, C] batch."""
    augs, origs, conds = [], [], []
    for i, img in enumerate(images):
        rng = np.random.RandomState((seed * 100003 + i) % (2 ** 31))
        a, o, c = pipeline(img, rng)
        augs.append(a)
        origs.append(o)
        conds.append(c)
    return np.stack(augs), np.stack(origs), np.stack(conds)
