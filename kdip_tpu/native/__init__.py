"""ctypes bindings for the native C++ image-loading runtime (loader.cc).

The shared library is compiled on first use with the system toolchain
(g++ -O2 -shared, linking libjpeg/libpng) and cached next to the source;
`available()` reports whether the native path can be used so callers
(kdip_tpu.data) can fall back to the pure-Python pipeline.

Counterpart of the reference's torch DataLoader worker machinery
(train_openai.py --num-workers; guided_diffusion/image_datasets.py:96-108):
decode/resize/crop/normalize run in C++ threads, Python keeps ordering and
all RNG draws so native and Python paths produce identical batches.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cc")
_LIB = os.path.join(_HERE, "libkdip_loader.so")

# PIL filter codes used by loader.cc
FILTER_BOX = 0
FILTER_BILINEAR = 1
FILTER_BICUBIC = 2
FILTER_LANCZOS = 3

_build_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile loader.cc -> libkdip_loader.so. Returns an error string or
    None. Rebuilds when the source is newer than the cached library."""
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return None
    cmd = ["g++", "-O2", "-fPIC", "-shared", "-pthread", "-std=c++17",
           _SRC, "-ljpeg", "-lpng", "-o", _LIB + ".tmp"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"native loader build failed to launch: {e}"
    if proc.returncode != 0:
        return f"native loader build failed:\n{proc.stderr[-2000:]}"
    os.replace(_LIB + ".tmp", _LIB)
    return None


def _load():
    global _lib, _build_error
    with _build_lock:
        if _lib is not None or _build_error is not None:
            return _lib
        err = _build()
        if err is not None:
            _build_error = err
            return None
        lib = ctypes.CDLL(_LIB)
        lib.kdip_loader_create.restype = ctypes.c_void_p
        lib.kdip_loader_create.argtypes = [ctypes.c_int]
        lib.kdip_loader_submit.restype = ctypes.c_int
        lib.kdip_loader_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int]
        lib.kdip_loader_wait.restype = ctypes.c_int64
        lib.kdip_loader_wait.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.kdip_loader_destroy.restype = None
        lib.kdip_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.kdip_probe_size.restype = ctypes.c_int
        lib.kdip_probe_size.argtypes = [ctypes.c_char_p,
                                        ctypes.POINTER(ctypes.c_int),
                                        ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native library is (or can be) built and loaded."""
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


NATIVE_SUFFIXES = {".jpg", ".jpeg", ".png"}


def probe_size(path: str) -> Optional[Tuple[int, int]]:
    """(width, height) from the image header, or None if unreadable."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    if lib.kdip_probe_size(os.fspath(path).encode(), ctypes.byref(w),
                           ctypes.byref(h)) != 0:
        return None
    return int(w.value), int(h.value)


class JobSpec:
    """Fully-resolved parameters for one image (all RNG already drawn)."""

    __slots__ = ("path", "smaller_dim", "square_w", "square_h", "filter",
                 "crop_size", "crop_x", "crop_y", "flip", "norm_mode")

    def __init__(self, path, smaller_dim=0, square_w=0, square_h=0,
                 filter=FILTER_BICUBIC, crop_size=0, crop_x=-1, crop_y=-1,
                 flip=0, norm_mode=0):
        self.path = os.fspath(path)
        self.smaller_dim = smaller_dim
        self.square_w = square_w
        self.square_h = square_h
        self.filter = filter
        self.crop_size = crop_size
        self.crop_x = crop_x
        self.crop_y = crop_y
        self.flip = flip
        self.norm_mode = norm_mode


class NativeLoader:
    """Thin RAII wrapper over the C++ thread pool."""

    def __init__(self, num_threads: int):
        lib = _load()
        if lib is None:
            raise RuntimeError(_build_error or "native loader unavailable")
        self._lib = lib
        self._handle = lib.kdip_loader_create(int(num_threads))
        self._pending = 0

    def submit(self, spec: JobSpec, tag: int, out: np.ndarray) -> None:
        """out: C-contiguous float32 buffer the worker writes into; the
        caller must keep it alive until the matching wait() returns."""
        assert out.dtype == np.float32 and out.flags["C_CONTIGUOUS"]
        rc = self._lib.kdip_loader_submit(
            self._handle, spec.path.encode(), tag, spec.smaller_dim,
            spec.square_w, spec.square_h, spec.filter, spec.crop_size,
            spec.crop_x, spec.crop_y, spec.flip, spec.norm_mode,
            out.ctypes.data_as(ctypes.c_void_p), out.size)
        if rc != 0:
            raise RuntimeError("submit after shutdown")
        self._pending += 1

    def wait(self) -> Tuple[int, Optional[str], Tuple[int, int]]:
        """Blocks for one completion -> (tag, errmsg_or_None, (h, w))."""
        assert self._pending > 0, "wait() with no outstanding jobs"
        errbuf = ctypes.create_string_buffer(512)
        w = ctypes.c_int(0)
        h = ctypes.c_int(0)
        tag = self._lib.kdip_loader_wait(self._handle, errbuf, len(errbuf),
                                         ctypes.byref(w), ctypes.byref(h))
        self._pending -= 1
        err = errbuf.value.decode(errors="replace") or None
        return int(tag), err, (int(h.value), int(w.value))

    def close(self):
        if self._handle is not None:
            # Drain: destroying with jobs in flight would let workers write
            # into buffers the caller may have released.
            while self._pending > 0:
                self.wait()
            self._lib.kdip_loader_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def decode_spec_pil(spec: JobSpec) -> np.ndarray:
    """Python re-execution of loader.cc's run_job for ONE JobSpec, via PIL
    (loader.cc:395-448 semantics: resize chain, crop, flip, normalize).
    All RNG is already resolved inside the spec, so this is deterministic —
    it is the per-item fallback for files the C++ decoder rejects (e.g.
    CMYK/YCCK JPEGs, which PIL converts to RGB)."""
    from PIL import Image

    filt = {FILTER_BOX: Image.BOX, FILTER_BILINEAR: Image.BILINEAR,
            FILTER_BICUBIC: Image.BICUBIC,
            FILTER_LANCZOS: Image.LANCZOS}[spec.filter]
    with Image.open(spec.path) as im:
        img = im.convert("RGB")
        if spec.smaller_dim > 0:
            while min(img.size) >= 2 * spec.smaller_dim:
                img = img.resize((img.width // 2, img.height // 2),
                                 Image.BOX)
            scale = spec.smaller_dim / min(img.size)
            img = img.resize((round(img.width * scale),
                              round(img.height * scale)), filt)
        elif spec.square_w > 0 and spec.square_h > 0:
            img = img.resize((spec.square_w, spec.square_h), filt)
        arr = np.asarray(img, dtype=np.float32)
    cs = spec.crop_size
    if cs > 0:
        cx = spec.crop_x if spec.crop_x >= 0 else (arr.shape[1] - cs) // 2
        cy = spec.crop_y if spec.crop_y >= 0 else (arr.shape[0] - cs) // 2
        if cx < 0 or cy < 0 or cx + cs > arr.shape[1] or cy + cs > arr.shape[0]:
            raise ValueError(f"crop out of bounds for {spec.path}")
        arr = arr[cy:cy + cs, cx:cx + cs]
    if spec.flip:
        arr = arr[:, ::-1]
    if spec.norm_mode == 0:
        arr = arr / np.float32(127.5) - np.float32(1.0)
    else:
        arr = (arr / np.float32(255.0)) * np.float32(2.0) - np.float32(1.0)
    return np.ascontiguousarray(arr, np.float32)


def batched_pipeline(specs=None, batch_size: int = 1,
                     out_shape: Tuple[int, int, int] = (0, 0, 0),
                     num_threads: int = 1, drop_last: bool = False,
                     prefetch_batches: int = 2, spec_fn=None,
                     n_items: Optional[int] = None) -> Iterator[np.ndarray]:
    """Stream items through the native pool as [B, H, W, C] float32
    batches, preserving order, decoding `prefetch_batches` batches ahead.

    Items come from `specs` (a materialized sequence) or lazily from
    `spec_fn(i)` over `n_items` — lazy is what kdip_tpu.data uses so that
    per-item RNG draws happen only `prefetch_batches` ahead of consumption
    rather than a whole epoch up front. Each item is a JobSpec (decoded in
    the C++ pool) or a ready [H, W, C] float32 array (pre-decoded on the
    Python side, e.g. a file whose header the native prober can't read).

    A per-item native decode failure (e.g. a CMYK JPEG the C++ decoder
    rejects) is repaired transparently by re-decoding that item with
    `decode_spec_pil` — matching the pure-Python path's PIL behavior —
    before its batch is yielded. Only a file neither decoder can read
    raises RuntimeError.
    """
    n = len(specs) if specs is not None else int(n_items)
    get_spec = (specs.__getitem__ if specs is not None else spec_fn)
    starts = list(range(0, n, batch_size))
    if drop_last:
        starts = [s for s in starts if s + batch_size <= n]
    if not starts:
        return

    out_shape = tuple(out_shape)
    with NativeLoader(num_threads) as loader:
        bufs: dict = {}       # batch_index -> [array, remaining_count]
        inflight: dict = {}   # tag -> JobSpec (for error messages/fallback)
        failed: dict = {}     # batch_index -> [(tag, errmsg), ...]

        def submit_batch(bi: int) -> None:
            s = starts[bi]
            count = min(batch_size, n - s)
            arr = np.empty((count,) + out_shape, np.float32)
            entry = bufs[bi] = [arr, 0]
            for j in range(count):
                item = get_spec(s + j)  # lazy path: RNG draws happen here
                if isinstance(item, np.ndarray):
                    if item.shape != out_shape:
                        raise RuntimeError(
                            f"pre-decoded item {s + j} has shape "
                            f"{item.shape}, expected {out_shape}")
                    arr[j] = item
                else:
                    tag = bi * batch_size + j
                    inflight[tag] = item
                    loader.submit(item, tag, arr[j])
                    entry[1] += 1

        next_submit = 0
        for _ in range(min(1 + prefetch_batches, len(starts))):
            submit_batch(next_submit)
            next_submit += 1

        for bi in range(len(starts)):
            while bufs[bi][1] > 0:
                tag, err, _ = loader.wait()
                done_bi = tag // batch_size
                if err is not None:
                    failed.setdefault(done_bi, []).append((tag, err))
                bufs[done_bi][1] -= 1
            arr = bufs.pop(bi)[0]
            for tag, err in failed.pop(bi, []):
                spec = inflight[tag]
                try:
                    item = decode_spec_pil(spec)
                except Exception as e:
                    raise RuntimeError(
                        f"{spec.path}: native decode failed ({err}); "
                        f"PIL fallback failed: {e}") from e
                if item.shape != out_shape:
                    raise RuntimeError(
                        f"{spec.path}: PIL fallback produced shape "
                        f"{item.shape}, expected {out_shape}")
                arr[tag % batch_size] = item
            for j in range(arr.shape[0]):
                inflight.pop(bi * batch_size + j, None)
            if next_submit < len(starts):
                submit_batch(next_submit)
                next_submit += 1
            yield arr
