"""Pallas-fused Winograd F(2x2, 3x3) conv: the transforms never touch HBM.

The jnp formulation (ops/winograd.py) gets the 2.25x MXU-FLOP reduction
but writes the 16/4 = 4x-inflated transformed activations U and M through
HBM, which can eat the win on a bandwidth-tight chip. This kernel keeps
everything except x and y on-chip:

  grid step (b, tile-row block):
    DMA a (TB+1, W/2+1) halo slab of the four input parity planes  -> VMEM
    build the 16 shifted tile views with unit-stride slices        (VMEM)
    input transform B^T d B   — adds only (coeffs 0, +-1)          (VPU)
    16 matmuls  U_p [N, C] @ V_p [C, F], f32 accumulation          (MXU)
    output transform A^T M A  — adds only, accumulated into 4      (VPU)
    f32 parity-plane accumulators, one write per block             -> HBM

Total HBM traffic = x once (as parity planes) + y once (as parity
planes) + V — the same bytes as the direct conv, at 1/2.25 the MXU work.

The parity-plane trick: x is split OUTSIDE the kernel into its four
(row, col) parities xp[i::2, j::2]; every one of the 16 Winograd tile
views d_(i,j)[t_r, t_c] = x_pad[2 t_r + i, 2 t_c + j] is then a
unit-stride slice plane[(i%2, j%2)][t_r + i//2, t_c + j//2] — no strided
VMEM gathers, which Mosaic lowers poorly. The output's 2x2 tiles are
written the same way and re-interleaved outside.

Constraints (asserted): H, W even; C and F <= 128 per call (the callers
in ops/winograd.py split larger C like the split-skip decoder does and
chunk F). B is a grid dimension (production guided sampling runs B=1
under the per-sample lax.map).

No reference counterpart (the reference's convs are all cuDNN); oracle
is ops/winograd.py's jnp formulation and lax.conv (tests/test_winograd.py).
"""

from __future__ import annotations

import functools
from typing import Tuple, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kdip_tpu.ops.experimental.winograd import kernel_transform

# A^T = [[1, 1, 1, 0], [0, 1, -1, -1]] as (k, i) -> coeff
_AT_COEFF = ((1, 1, 1, 0), (0, 1, -1, -1))


def _pick_tb(th: int, tw: int) -> int:
    """Tile-row block size: target ~512 matmul rows, divide th evenly."""
    target = max(1, 512 // max(tw, 1))
    tb = min(th, target)
    while th % tb:
        tb -= 1
    return tb


def _wino_kernel(*refs, tb: int, tw: int, twp: int,
                 c: int, f: int, th: int, dtype, prologue: bool,
                 manual_dma: bool):
    """refs = (planes..., v_ref, [a_ref, b_ref,] out_ref, scratch...).

    Two input-pipelining modes:
    - manual_dma=False (default): the halo'd slab arrives as two
      overlapping BlockSpec'd inputs (a tb-row body and the 1-row halo) —
      Mosaic double-buffers blocked inputs across grid steps for free.
    - manual_dma=True: one ANY-space planes input, DMA'd synchronously
      into VMEM scratch per step (kept for A/B; stalls on the copy).

    With prologue=True the slab holds RAW x parity planes and the kernel
    applies silu(x*a + b) before the Winograd transform — replaying
    GroupNorm32's exact composition (f32 affine, round to the torso
    dtype, silu in that dtype; models/layers.py _FusedGroupNorm) — and
    re-zeroes the conv's same-padding border, which the affine would
    otherwise corrupt (silu(b) != 0)."""
    if manual_dma:
        planes_ref, v_ref = refs[0], refs[1]
        rest = refs[2:]
    else:
        body_ref, halo_ref, v_ref = refs[0], refs[1], refs[2]
        rest = refs[3:]
    if prologue:
        a_ref, b_ref = rest[0], rest[1]
        rest = rest[2:]
    out_ref = rest[0]
    b = pl.program_id(0)
    blk = pl.program_id(1)

    if manual_dma:
        slab_ref, sem = rest[1], rest[2]
        dma = pltpu.make_async_copy(
            planes_ref.at[b, :, pl.ds(blk * tb, tb + 1), :, :], slab_ref,
            sem)
        dma.start()
        dma.wait()
        slab = slab_ref[:]
    else:
        slab = jnp.concatenate([body_ref[0], halo_ref[0]], axis=1)

    n = tb * tw

    if prologue:
        av = a_ref[b][None, None, :]
        bv = b_ref[b][None, None, :]
        # padded-row index 2*pr + pi == 0 or H+1  <=>  (pi==0, pr==0) or
        # (pi==1, pr==th); cols likewise — those positions are the conv's
        # zero padding and must stay zero through the prologue.
        rows = jax.lax.broadcasted_iota(jnp.int32, (tb + 1, twp), 0) \
            + blk * tb
        cols = jax.lax.broadcasted_iota(jnp.int32, (tb + 1, twp), 1)
        outs = []
        for p in range(4):
            pi, pj = p // 2, p % 2
            t = slab[p].astype(jnp.float32) * av + bv
            # replay the reference rounding of the affine output, but run the
            # silu itself on f32 lanes: Mosaic's bf16 logistic lowering emits
            # an f32->bf16 vector.broadcast that fails verification on-chip
            # (XLA's own bf16 silu also evaluates at excess precision, so
            # this matches the _FusedGroupNorm composition to <1 bf16 ulp)
            t = t.astype(dtype).astype(jnp.float32)
            s = jax.nn.silu(t).astype(dtype)
            pad = ((rows == (0 if pi == 0 else th))
                   | (cols == (0 if pj == 0 else tw)))
            # Mosaic can only insert a minor dim on 32-bit lanes: reshape a
            # f32 keep-mask, cast after, and multiply (an i1/bf16 [:, :, None]
            # fails on-chip with "Insertion of minor dim that is not a no-op")
            keep = jnp.where(pad, 0.0, 1.0)[:, :, None].astype(s.dtype)
            outs.append(s * keep)
        slab = jnp.stack(outs, axis=0)

    # the 16 tile views, as unit-stride slices of the parity slab
    def d(i, j):
        p = (i % 2) * 2 + (j % 2)
        return slab[p, i // 2:i // 2 + tb, j // 2:j // 2 + tw, :]

    # B^T along rows: a_kj, k in 0..3 (coeffs 0/+-1 -> adds only)
    a = [[None] * 4 for _ in range(4)]
    for j in range(4):
        d0, d1, d2, d3 = d(0, j), d(1, j), d(2, j), d(3, j)
        a[0][j] = d0 - d2
        a[1][j] = d1 + d2
        a[2][j] = d2 - d1
        a[3][j] = d1 - d3

    # B along cols + matmul + output-transform accumulation, fused per p
    y = [[jnp.zeros((n, f), jnp.float32) for _ in range(2)] for _ in range(2)]
    for i in range(4):
        a0, a1, a2, a3 = a[i]
        u_cols = (a0 - a2, a1 + a2, a2 - a1, a1 - a3)
        for j in range(4):
            u = u_cols[j].reshape(n, c)
            m = jnp.dot(u, v_ref[i * 4 + j],
                        preferred_element_type=jnp.float32)
            for k in range(2):
                ck = _AT_COEFF[k][i]
                if ck == 0:
                    continue
                for l in range(2):
                    cl = _AT_COEFF[l][j]
                    if cl == 0:
                        continue
                    coef = ck * cl
                    y[k][l] = y[k][l] + (m if coef == 1 else -m)

    for k in range(2):
        for l in range(2):
            out_ref[0, k * 2 + l] = y[k][l].reshape(tb, tw, f).astype(dtype)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover - no backend at all
        return False


@functools.partial(jax.jit, static_argnames=("interpret",))
def _wino_pallas_single(x: jnp.ndarray, v: jnp.ndarray,
                        a: jnp.ndarray | None = None,
                        b: jnp.ndarray | None = None,
                        interpret: bool = False) -> jnp.ndarray:
    """x: [B, H, W, C<=128], v: [16, C, F<=128] -> y [B, H, W, F].

    With (a, b) [B, C] f32, the kernel applies the fused
    silu(x*a + b) prologue to the raw x before the transform."""
    B, H, W, C = x.shape
    F = v.shape[-1]
    th, tw = H // 2, W // 2
    tb = _pick_tb(th, tw)
    prologue = a is not None

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # parity planes [B, 4, th+1, tw+1, C]
    planes = jnp.stack(
        [xp[:, i::2, j::2, :] for i in range(2) for j in range(2)], axis=1)
    twp = tw + 1

    import os
    manual_dma = os.environ.get("KDIP_WINOGRAD_DMA", "") == "manual"

    grid = (B, th // tb)
    affine_specs = ([pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
                    if prologue else [])
    affine_args = ((a.astype(jnp.float32), b.astype(jnp.float32))
                   if prologue else ())
    kern = functools.partial(_wino_kernel, tb=tb, tw=tw, twp=twp, c=C, f=F,
                             th=th, dtype=x.dtype, prologue=prologue,
                             manual_dma=manual_dma)
    if manual_dma:
        plane_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        plane_args = (planes,)
        scratch = [pltpu.VMEM((4, tb + 1, twp, C), x.dtype),
                   pltpu.SemaphoreType.DMA(())]
    else:
        # overlapping body + 1-row halo blocks: Mosaic double-buffers
        # BlockSpec'd inputs across grid steps, so the input copy overlaps
        # compute with no manual DMA machinery.
        plane_specs = [
            pl.BlockSpec((1, 4, tb, twp, C), lambda b, i: (b, 0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 1, twp, C),
                         lambda b, i: (b, 0, i * tb + tb, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        plane_args = (planes, planes)
        scratch = []
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            *plane_specs,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            *affine_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, 4, tb, tw, F), lambda b, i: (b, 0, i, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 4, th, tw, F), x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*plane_args, v, *affine_args)

    # re-interleave the 2x2 output parities: [B, 4, th, tw, F] -> [B,H,W,F]
    y = out.reshape(B, 2, 2, th, tw, F)
    y = y.transpose(0, 3, 1, 4, 2, 5)  # [B, th, 2, tw, 2, F]
    return y.reshape(B, H, W, F)


def _forward(x_parts: Tuple[jnp.ndarray, ...], kernel: jnp.ndarray,
             interpret: bool, affine=None) -> jnp.ndarray:
    dtype = x_parts[0].dtype
    F = kernel.shape[-1]
    v = kernel_transform(kernel, dtype)  # [16, Cin, F]

    f_chunks = []
    for f0 in range(0, F, 128):
        fw = min(128, F - f0)
        acc = None
        off = 0
        for p in x_parts:
            cp = p.shape[-1]
            for c0 in range(0, cp, 128):
                cw = min(128, cp - c0)
                ca = cb = None
                if affine is not None:
                    ca = affine[0][:, off + c0:off + c0 + cw]
                    cb = affine[1][:, off + c0:off + c0 + cw]
                part = _wino_pallas_single(
                    p[..., c0:c0 + cw],
                    v[:, off + c0:off + c0 + cw, f0:f0 + fw],
                    ca, cb, interpret=interpret)
                acc = part if acc is None else acc + part
            off += cp
        f_chunks.append(acc)
    return f_chunks[0] if len(f_chunks) == 1 else jnp.concatenate(
        f_chunks, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _wino_op(x_parts, kernel, interpret):
    return _forward(x_parts, kernel, interpret)


def _wino_fwd(x_parts, kernel, interpret):
    return _forward(x_parts, kernel, interpret), (x_parts, kernel)


def _wino_bwd(interpret, res, g):
    x_parts, kernel = res
    # d/dx: correlation with the spatially-flipped, C/F-swapped kernel —
    # itself a 3x3 stride-1 same-padding conv, so it reuses this kernel.
    k_rot = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
    gx = _forward((g,), k_rot, interpret)
    offs, gparts = 0, []
    for p in x_parts:
        cp = p.shape[-1]
        gparts.append(gx[..., offs:offs + cp].astype(p.dtype))
        offs += cp
    # d/dkernel: standard conv weight gradient via XLA (training path only;
    # guided sampling never differentiates parameters).
    xc = (x_parts[0] if len(x_parts) == 1
          else jnp.concatenate(x_parts, axis=-1))
    lhs = xc.transpose(3, 1, 2, 0)           # [C, H, W, B]: C as batch
    rhs = g.transpose(1, 2, 0, 3)            # [H, W, B, F]: B as "in"
    gk = jax.lax.conv_general_dilated(
        lhs, rhs, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=jax.lax.conv_dimension_numbers(
            lhs.shape, rhs.shape, ("NHWC", "HWIO", "NHWC")),
    )
    # gk: [C, 3, 3, F] -> [3, 3, C, F]
    gk = gk.transpose(1, 2, 0, 3).astype(kernel.dtype)
    return tuple(gparts), gk


_wino_op.defvjp(_wino_fwd, _wino_bwd)


def _affine_silu(x_parts, a, b):
    """The prologue's reference composition (GroupNorm32 apply + silu):
    f32 affine, round to the torso dtype, silu in that dtype."""
    outs, off = [], 0
    for p in x_parts:
        cp = p.shape[-1]
        t = (p.astype(jnp.float32) * a[:, None, None, off:off + cp]
             + b[:, None, None, off:off + cp])
        outs.append(jax.nn.silu(t.astype(p.dtype)))
        off += cp
    return tuple(outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _wino_fused_op(x_parts, kernel, a, b, interpret):
    return _forward(x_parts, kernel, interpret, affine=(a, b))


def _wino_fused_fwd(x_parts, kernel, a, b, interpret):
    return (_forward(x_parts, kernel, interpret, affine=(a, b)),
            (x_parts, kernel, a, b))


def _wino_fused_bwd(interpret, res, g):
    """VJP of conv3x3(silu(x*a+b), W): the heavy conv pullback reuses the
    fused kernel (no prologue); the silu/affine chain is recomputed
    elementwise (XLA fuses it into the surrounding reads)."""
    x_parts, kernel, a, b = res
    k_rot = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
    gs_full = _forward((g,), k_rot, interpret)  # cotangent wrt s = silu(t)

    gparts, gas, gbs = [], [], []
    off = 0
    for p in x_parts:
        cp = p.shape[-1]
        av = a[:, None, None, off:off + cp].astype(jnp.float32)
        bv = b[:, None, None, off:off + cp].astype(jnp.float32)
        x32 = p.astype(jnp.float32)
        t = x32 * av + bv
        sig = jax.nn.sigmoid(t)
        dsilu = sig * (1.0 + t * (1.0 - sig))
        dt = gs_full[..., off:off + cp].astype(jnp.float32) * dsilu
        gparts.append((dt * av).astype(p.dtype))
        gas.append(jnp.sum(dt * x32, axis=(1, 2)))
        gbs.append(jnp.sum(dt, axis=(1, 2)))
        off += cp

    s_parts = _affine_silu(x_parts, a, b)
    sc = (s_parts[0] if len(s_parts) == 1
          else jnp.concatenate(s_parts, axis=-1))
    lhs = sc.transpose(3, 1, 2, 0)
    rhs = g.transpose(1, 2, 0, 3)
    gk = jax.lax.conv_general_dilated(
        lhs, rhs, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=jax.lax.conv_dimension_numbers(
            lhs.shape, rhs.shape, ("NHWC", "HWIO", "NHWC")),
    ).transpose(1, 2, 0, 3).astype(kernel.dtype)
    return (tuple(gparts), gk,
            jnp.concatenate(gas, -1).astype(a.dtype),
            jnp.concatenate(gbs, -1).astype(b.dtype))


_wino_fused_op.defvjp(_wino_fused_fwd, _wino_fused_bwd)


def winograd_conv3x3_pallas(
    x: Union[jnp.ndarray, Tuple[jnp.ndarray, ...]],
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    dtype=None,
    interpret: bool | None = None,
    prologue: Tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """Same contract as winograd_conv3x3_jnp, Pallas-fused on TPU.

    prologue=(a, b) ([B, Cin] each) additionally fuses silu(x*a + b) into
    the kernel's slab load — the normalized activation never exists in
    HBM (the GroupNorm-apply + silu HBM round trip disappears)."""
    parts = x if isinstance(x, tuple) else (x,)
    if dtype is not None:
        parts = tuple(p.astype(dtype) for p in parts)
    if interpret is None:
        interpret = not _on_tpu()
    if prologue is not None:
        y = _wino_fused_op(tuple(parts), kernel, prologue[0], prologue[1],
                           interpret)
    else:
        y = _wino_op(tuple(parts), kernel, interpret)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
