"""Tiled / self-ensembled inference for inputs larger than the training size.

Equivalent of the reference's DiffPIR inference tiling
(`condition/diffpir_utils/utils_model.py:16-199`): replication-pad to a
modulo, receptive-field-aware recursive quadrant split with overlap
stitching, and the x8 dihedral self-ensemble. This is the reference's only
"long-input" scaling mechanism (SURVEY.md §5).

Host-level orchestration (Python recursion over static shapes) around a
jittable `apply(x) -> y` — each distinct tile shape compiles once.
NHWC layout.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import numpy as np


def replication_pad_to_modulo(x: jnp.ndarray, modulo: int) -> jnp.ndarray:
    """Edge-pad bottom/right so H, W are multiples of modulo
    (ref: utils_model.py:67-74 test_pad)."""
    h, w = x.shape[1:3]
    pad_b = int(math.ceil(h / modulo) * modulo - h)
    pad_r = int(math.ceil(w / modulo) * modulo - w)
    if pad_b == 0 and pad_r == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)), mode="edge")


def apply_padded(apply: Callable, x: jnp.ndarray, modulo: int = 16,
                 sf: int = 1) -> jnp.ndarray:
    """mode 1 'pad' (ref: utils_model.py:67-74)."""
    h, w = x.shape[1:3]
    y = apply(replication_pad_to_modulo(x, modulo))
    return y[:, :h * sf, :w * sf, :]


def apply_split(apply: Callable, x: jnp.ndarray, refield: int = 32,
                min_size: int = 256, sf: int = 1, modulo: int = 1,
                once: bool = False) -> jnp.ndarray:
    """Recursive quadrant split with receptive-field overlap
    (ref: utils_model.py:84-117 test_split_fn, 121-145 test_onesplit).

    Tiles overlap by the receptive field; only the interior half of each
    tile's output is kept, so seams carry full context.
    """
    h, w = x.shape[1:3]
    if not once and h * w <= min_size ** 2:
        return apply_padded(apply, x, modulo, sf)

    top = slice(0, (h // 2 // refield + 1) * refield)
    bottom = slice(h - (h // 2 // refield + 1) * refield, h)
    left = slice(0, (w // 2 // refield + 1) * refield)
    right = slice(w - (w // 2 // refield + 1) * refield, w)
    tiles = [x[:, top, left, :], x[:, top, right, :],
             x[:, bottom, left, :], x[:, bottom, right, :]]

    if once or h * w <= 4 * (min_size ** 2):
        outs = [apply(t) for t in tiles]
    else:
        outs = [apply_split(apply, t, refield, min_size, sf, modulo)
                for t in tiles]

    B = x.shape[0]
    C = outs[0].shape[-1]
    E = jnp.zeros((B, sf * h, sf * w, C), outs[0].dtype)
    E = E.at[:, :h // 2 * sf, :w // 2 * sf, :].set(
        outs[0][:, :h // 2 * sf, :w // 2 * sf, :])
    E = E.at[:, :h // 2 * sf, w // 2 * sf:w * sf, :].set(
        outs[1][:, :h // 2 * sf, (-w + w // 2) * sf:, :])
    E = E.at[:, h // 2 * sf:h * sf, :w // 2 * sf, :].set(
        outs[2][:, (-h + h // 2) * sf:, :w // 2 * sf, :])
    E = E.at[:, h // 2 * sf:h * sf, w // 2 * sf:w * sf, :].set(
        outs[3][:, (-h + h // 2) * sf:, (-w + w // 2) * sf:, :])
    return E


def augment_img(x: jnp.ndarray, mode: int) -> jnp.ndarray:
    """The 8 dihedral transforms, matching the reference's KAIR convention
    (ref: dps_utils usage via utils_image.augment_img): mode 0..7."""
    if mode == 0:
        return x
    elif mode == 1:
        return jnp.rot90(jnp.flip(x, axis=1), k=1, axes=(1, 2))
    elif mode == 2:
        return jnp.flip(x, axis=1)
    elif mode == 3:
        return jnp.rot90(x, k=3, axes=(1, 2))
    elif mode == 4:
        return jnp.rot90(jnp.flip(x, axis=1), k=2, axes=(1, 2))
    elif mode == 5:
        return jnp.rot90(x, k=1, axes=(1, 2))
    elif mode == 6:
        return jnp.rot90(x, k=2, axes=(1, 2))
    elif mode == 7:
        return jnp.rot90(jnp.flip(x, axis=1), k=3, axes=(1, 2))
    raise ValueError(mode)


def apply_x8(apply: Callable, x: jnp.ndarray, modulo: int = 1,
             split: bool = False, **split_kw) -> jnp.ndarray:
    """x8 dihedral self-ensemble (ref: utils_model.py:167-178 test_x8,
    184-194 test_split_x8): average the de-augmented outputs over all 8
    transforms; modes 3 and 5 invert with 8-i."""
    outs = []
    for i in range(8):
        xi = augment_img(x, i)
        yi = (apply_split(apply, xi, modulo=modulo, **split_kw) if split
              else apply_padded(apply, xi, modulo))
        inv = 8 - i if i in (3, 5) else i
        outs.append(augment_img(yi, inv))
    return jnp.mean(jnp.stack(outs, axis=0), axis=0)


def tiled_inference(apply: Callable, x: jnp.ndarray, mode: int = 0,
                    refield: int = 32, min_size: int = 256, sf: int = 1,
                    modulo: int = 1) -> jnp.ndarray:
    """Dispatch matching the reference's test_mode ids
    (ref: utils_model.py:16-45): 0 normal, 1 pad, 2 split, 3 x8,
    4 split+x8, 5 one-split."""
    if mode == 0:
        return apply(x)
    if mode == 1:
        return apply_padded(apply, x, modulo, sf)
    if mode == 2:
        return apply_split(apply, x, refield, min_size, sf, modulo)
    if mode == 3:
        return apply_x8(apply, x, modulo)
    if mode == 4:
        return apply_x8(apply, x, modulo, split=True, refield=refield,
                        min_size=min_size, sf=sf)
    if mode == 5:
        return apply_split(apply, x, refield, min_size, sf, modulo, once=True)
    raise ValueError(f"unknown tiling mode {mode}")
