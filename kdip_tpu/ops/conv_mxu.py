"""Alternative 3x3-conv formulations for per-stage A/B on the MXU.

The guided-sampling trace (RESULTS_PROFILE.json) shows XLA's
conv_general_dilated kernels running at 64-79% of bf16 peak individually —
they ARE the MFU gap once the elementwise tail is fused away (DESIGN.md).
These variants re-express the same conv so XLA tiles it differently;
`scripts/bench_conv_stage_shapes.py` measures each at the UNet's actual
stage shapes on-chip and the routing picks per-shape winners.

(Ref counterpart: the torch reference leaves all convs to cuDNN,
guided_diffusion/unet.py — there is no per-stage tuning surface to cite;
this module is TPU-native performance work.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def conv3x3_nhwc(x: jnp.ndarray, kernel: jnp.ndarray,
                 bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Baseline: XLA conv, NHWC/HWIO (what nn.Conv emits)."""
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if bias is None else y + bias


def conv3x3_nchw(x: jnp.ndarray, kernel: jnp.ndarray,
                 bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Layout variant: run the conv in NCHW/OIHW. XLA may pick a different
    internal tiling; the transposes at the boundary are part of what the
    A/B measures (in a real torso they would amortize across the chain)."""
    xt = x.transpose(0, 3, 1, 2)
    kt = kernel.transpose(3, 2, 0, 1)
    y = jax.lax.conv_general_dilated(
        xt, kt, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    y = y.transpose(0, 2, 3, 1)
    return y if bias is None else y + bias


def conv3x3_im2col(x: jnp.ndarray, kernel: jnp.ndarray,
                   bias: Optional[jnp.ndarray] = None,
                   dtype=None) -> jnp.ndarray:
    """Explicit im2col: 9 shifted views concatenated on the channel axis,
    then ONE [B*H*W, 9*Cin] x [9*Cin, F] matmul — the formulation with the
    largest possible single MXU contraction (K = 9*Cin) at the cost of a
    9x activation inflation feeding it. Wins when the conv is
    MXU-tiling-bound rather than HBM-bound (small spatial, big C)."""
    B, H, W, C = x.shape
    F = kernel.shape[-1]
    dtype = dtype or x.dtype
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # index order (i, j, c) matches kernel.reshape(9*C, F) of HWIO
    cols = [xp[:, i:i + H, j:j + W, :] for i in range(3) for j in range(3)]
    patches = jnp.concatenate(cols, axis=-1).astype(dtype)
    w = kernel.reshape(9 * C, F).astype(dtype)
    y = patches.reshape(B * H * W, 9 * C) @ w
    y = y.reshape(B, H, W, F).astype(x.dtype)
    return y if bias is None else y + bias
