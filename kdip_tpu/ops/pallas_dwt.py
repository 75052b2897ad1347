"""Fused multi-level Haar DWT as a Pallas TPU kernel.

The jnp implementation (ops/transforms.dwt2) materializes the full array
after every level; this kernel keeps the whole [H, W] plane in VMEM and runs
all levels as butterfly *matmuls* on the MXU (out = P_h @ x @ P_w^T per
level, with P the orthonormal Haar packing matrix), so the transform is one
HBM read + one HBM write regardless of level count.

Grid: (B, C) — one program per image plane; a 256x256 fp32 plane is 256 KB,
comfortably within VMEM. Mosaic needs the matmul dims as the two minor dims,
so the NHWC input is transposed to channel planes around the kernel.

Measured on v5e (256x256x3, level 3): ~1.56 ms dwt+idwt vs ~1.46 ms for the
fused jnp butterflies — the matmul formulation trades O(n^2) adds for
O(n^3) MXU flops and two layout transposes, so it does NOT beat XLA's fusion
at this size; it is kept as the `OrthoTransform(..., use_pallas=True)`
option and as the Pallas integration template (custom-VJP linear kernel).
The default path remains ops/transforms.dwt2.

The transform is linear and orthonormal, so its custom VJP is the inverse
kernel (W^T == W^{-1}), matching the reference's LinearFunction trick
(condition/utils.py:31-43).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _haar_packing_matrix(s: int) -> np.ndarray:
    """[s, s] orthonormal matrix mapping a length-s signal to packed
    [lows (s/2); highs (s/2)] Haar coefficients."""
    P = np.zeros((s, s), np.float32)
    inv = 1.0 / np.sqrt(2.0)
    for i in range(s // 2):
        P[i, 2 * i] = inv
        P[i, 2 * i + 1] = inv
        P[s // 2 + i, 2 * i] = inv
        P[s // 2 + i, 2 * i + 1] = -inv
    return P


def _dwt_kernel(x_ref, *refs, level: int, inverse: bool):
    # refs: level packing matrices for H then W (P_h0..P_h{L-1}, P_w0..),
    # then the output ref last. One program per (batch, channel) plane;
    # levels stage through the (VMEM) output ref via static sub-slices.
    o_ref = refs[-1]
    mats = refs[:-1]
    H, W = x_ref.shape[-2:]
    o_ref[0, 0] = x_ref[0, 0]
    levels = range(level) if not inverse else range(level - 1, -1, -1)
    for lv in levels:
        hs, ws = H >> lv, W >> lv
        blk = o_ref[0, 0, :hs, :ws]
        Ph = mats[lv][...]
        Pw = mats[level + lv][...]
        if inverse:
            # inverse of out = Ph @ x @ Pw^T is x = Ph^T @ out @ Pw
            Ph, Pw = Ph.T, Pw.T
        t = jnp.dot(Ph, blk, preferred_element_type=jnp.float32)
        t = jnp.dot(t, Pw.T, preferred_element_type=jnp.float32)
        o_ref[0, 0, :hs, :ws] = t


def _run(x: jnp.ndarray, level: int, inverse: bool,
         interpret: bool) -> jnp.ndarray:
    B, H, W, C = x.shape
    assert H % (1 << level) == 0 and W % (1 << level) == 0
    mats = ([jnp.asarray(_haar_packing_matrix(H >> lv)) for lv in range(level)]
            + [jnp.asarray(_haar_packing_matrix(W >> lv)) for lv in range(level)])
    mat_specs = [pl.BlockSpec(m.shape, lambda b, c: (0, 0),
                              memory_space=pltpu.VMEM)
                 for m in mats]
    # channel-planes layout: Mosaic wants the (H, W) matmul dims as the two
    # minor dims, so transpose NHWC -> NCHW around the kernel
    kernel = functools.partial(_dwt_kernel, level=level, inverse=inverse)
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32).transpose(0, 3, 1, 2)
    out = pl.pallas_call(
        kernel,
        grid=(B, C),
        in_specs=[pl.BlockSpec((1, 1, H, W), lambda b, c: (b, c, 0, 0),
                               memory_space=pltpu.VMEM)] + mat_specs,
        out_specs=pl.BlockSpec((1, 1, H, W), lambda b, c: (b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
        interpret=interpret,
    )(x32, *mats)
    return out.transpose(0, 2, 3, 1).astype(orig_dtype)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def dwt2_pallas(x: jnp.ndarray, level: int = 3, interpret: bool = None):
    """Packed multi-level Haar DWT, NHWC, fused single-pass on TPU.
    Equals ops.transforms.dwt2 numerically."""
    if interpret is None:
        interpret = not _on_tpu()
    return _run(x, level, inverse=False, interpret=interpret)


def _dwt_fwd(x, level, interpret):
    return dwt2_pallas(x, level, interpret), None


def _dwt_bwd(level, interpret, _, g):
    # orthonormal: adjoint == inverse
    return (idwt2_pallas(g, level, interpret),)


dwt2_pallas.defvjp(_dwt_fwd, _dwt_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def idwt2_pallas(x: jnp.ndarray, level: int = 3, interpret: bool = None):
    """Inverse of dwt2_pallas."""
    if interpret is None:
        interpret = not _on_tpu()
    return _run(x, level, inverse=True, interpret=interpret)


def _idwt_fwd(x, level, interpret):
    return idwt2_pallas(x, level, interpret), None


def _idwt_bwd(level, interpret, _, g):
    return (dwt2_pallas(g, level, interpret),)


idwt2_pallas.defvjp(_idwt_fwd, _idwt_bwd)
