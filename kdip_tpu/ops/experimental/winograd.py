"""Winograd F(2x2, 3x3) convolution for the UNet's hot 3x3 convs.

Why: the post-split-skip device trace (RESULTS_PROFILE.json) has 71.5% of
guided-NFE time in 3x3 stride-1 same-padding NHWC convs that individually
run at only 64-79% of bf16 peak; the only way past ~46% MFU is to make the
convs themselves cheaper. Winograd F(2,3) computes each 2x2 output tile
with 16 multiplies instead of 36 — a 2.25x MXU-FLOP reduction — using
transform matrices whose entries are all 0, ±1, ±1/2, so the bf16 drift is
within ~2x of the direct conv's own rounding (measured 5.7e-3 vs 2.3e-3
max-rel on the hot shape; scripts/winograd_proto.py). F(4,3) was measured
and REJECTED: its {4, 5, 8} coefficients amplify cancellation to ~7e-2
in bf16, 30x the direct conv.

The reference delegates all convs to cuDNN (torch.nn.Conv2d throughout
guided_diffusion/unet.py); this module is TPU-native work with no
reference counterpart.

Two implementations behind one signature:
- `winograd_conv3x3_jnp`: pure-jnp einsum formulation. XLA maps the 16
  per-position matmuls onto the MXU, but the transformed activations
  (16/4 = 4x inflation) round-trip through HBM.
- a Pallas-fused variant (see `winograd_pallas.py`) that keeps the
  transforms in VMEM, for the shapes where it wins.

Both accept a channel-split input tuple (the split-skip decoder fast path,
models/layers.py): each part is transformed separately, matmul'd against
its slice of the transformed kernel, and summed in transform space —
one output transform, and neither the spatial concat nor its transform
ever exists.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

# F(2x2, 3x3), interpolation points {0, +-1, inf}:
#   Y = A^T [ (G g G^T) . (B^T d B) ] A   per 4x4 input / 2x2 output tile.
_BT = np.array([
    [1,  0, -1,  0],
    [0,  1,  1,  0],
    [0, -1,  1,  0],
    [0,  1,  0, -1],
], dtype=np.float32)
_G = np.array([
    [1,    0,   0],
    [0.5,  0.5, 0.5],
    [0.5, -0.5, 0.5],
    [0,    0,   1],
], dtype=np.float32)
_AT = np.array([
    [1, 1,  1,  0],
    [0, 1, -1, -1],
], dtype=np.float32)


def kernel_transform(w: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """[3, 3, C, F] HWIO -> V [16, C, F]; transform computed in f32."""
    v = jnp.einsum("ik,klcf,jl->ijcf", _G, w.astype(jnp.float32), _G)
    v = v.reshape(16, *w.shape[2:])
    return v.astype(dtype) if dtype is not None else v


def _input_tiles(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> the 16 stride-2 shifted views D [4, 4, B, th, tw, C]
    of the same-padded input (th = H//2, tw = W//2)."""
    B, H, W, C = x.shape
    th, tw = H // 2, W // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows = []
    for i in range(4):
        cols = []
        for j in range(4):
            cols.append(xp[:, i:i + 2 * th:2, j:j + 2 * tw:2, :])
        rows.append(jnp.stack(cols, 0))
    return jnp.stack(rows, 0)


def _transform_input(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """[B, H, W, C] -> U [16, B*th*tw, C] ready for the MXU matmuls.

    B^T has only 0/±1 entries, so the transform is pure adds — computed in
    the input dtype (no precision lost: bf16 a-b of bf16 inputs rounds
    once, same as the direct conv's own input rounding).
    """
    B, H, W, C = x.shape
    d = _input_tiles(x)
    u = jnp.einsum("ik,jl,klbtwc->ijbtwc",
                   _BT.astype(x.dtype), _BT.astype(x.dtype), d)
    return u.reshape(16, B * (H // 2) * (W // 2), C).astype(dtype)


def winograd_conv3x3_jnp(
    x: Union[jnp.ndarray, Tuple[jnp.ndarray, ...]],
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    dtype=None,
) -> jnp.ndarray:
    """3x3 stride-1 same-padding conv, Winograd F(2,3), NHWC.

    x: [B, H, W, C] with H, W even — or a tuple of channel parts summing
    to the kernel's Cin (split-skip: summed in transform space).
    kernel: [3, 3, Cin, F] HWIO. Matmuls run in `dtype`
    (default: x.dtype); tile transforms are adds in the input dtype.
    """
    parts = x if isinstance(x, tuple) else (x,)
    dtype = dtype or parts[0].dtype
    B, H, W, _ = parts[0].shape
    F = kernel.shape[-1]
    th, tw = H // 2, W // 2

    v = kernel_transform(kernel, dtype)  # [16, Cin, F]

    m = None
    off = 0
    for p in parts:
        cp = p.shape[-1]
        u = _transform_input(p.astype(dtype), dtype)
        mm = jnp.einsum("pnc,pcf->pnf", u, v[:, off:off + cp, :])
        m = mm if m is None else m + mm
        off += cp

    m = m.reshape(4, 4, B, th, tw, F)
    at = _AT.astype(m.dtype)
    y = jnp.einsum("ki,lj,ijbtwf->btkwlf", at, at, m)
    y = y.reshape(B, H, W, F).astype(parts[0].dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def winograd_conv3x3(x, kernel, bias=None, dtype=None, impl=None,
                     prologue=None):
    """Dispatcher: `impl` in {'jnp', 'pallas'}; default from
    KDIP_WINOGRAD_IMPL (falls back to 'pallas', the fused kernel — the
    jnp path's transformed activations round-trip HBM at 4x inflation).
    prologue=(a, b): fused silu(x*a + b) input transform (pallas); the
    jnp impl applies the identical composition unfused."""
    import os
    impl = impl or os.environ.get("KDIP_WINOGRAD_IMPL", "pallas")
    if impl == "pallas":
        from kdip_tpu.ops.experimental.winograd_pallas import winograd_conv3x3_pallas
        return winograd_conv3x3_pallas(x, kernel, bias=bias, dtype=dtype,
                                       prologue=prologue)
    if prologue is not None:
        from kdip_tpu.ops.experimental.winograd_pallas import _affine_silu
        parts = x if isinstance(x, tuple) else (x,)
        if dtype is not None:
            parts = tuple(p.astype(dtype) for p in parts)
        parts = _affine_silu(parts, *prologue)
        x = parts if isinstance(x, tuple) else parts[0]
    return winograd_conv3x3_jnp(x, kernel, bias=bias, dtype=dtype)
