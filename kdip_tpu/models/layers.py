"""NN primitives for the ADM UNet family (TPU-native, NHWC, Flax linen).

Functional equivalents of `guided_diffusion/nn.py` and the blocks of
`guided_diffusion/unet.py`, redesigned for TPU: channels-last layout (native
for TPU convolutions), fp32 GroupNorm statistics with configurable compute
dtype (bfloat16 torso like the reference's fp16 torso), and attention as
batched einsums that XLA tiles onto the MXU.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoidal timestep embeddings (ref: guided_diffusion/nn.py:103-121).

    timesteps: [N] (possibly fractional). Returns [N, dim], cos-first order.
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding.astype(dtype)


class _FusedGroupNorm(nn.Module):
    """f32-statistics GroupNorm for low-precision torsos, written so XLA
    fuses every dtype convert into its consumer.

    The naive `gn(x.astype(f32)).astype(bf16)` materializes two full f32
    activation copies per norm site (profiled: standalone
    convert_element_type ops + unfused reduces are ~15% of guided-NFE
    device time, RESULTS_PROFILE.json). Here the f32 copy never exists in
    HBM: the convert feeds a one-pass (mean, mean-of-squares) reduction,
    and the apply is a single fused x*a+b elementwise chain in f32 that
    rounds straight back to the torso dtype. Statistics and apply math
    stay f32 — same precision contract as the reference's fp16 torso
    (guided_diffusion/nn.py:17-19), ~3x less norm HBM traffic.
    """
    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, return_affine: bool = False):
        """return_affine=True: skip the apply pass and return the per-sample
        per-channel affine `(a, b)` (each [B, C] f32, concat order for
        tuples) such that gn(x) == x*a + b — consumed by the Winograd
        kernel's fused prologue (ops/experimental/winograd_pallas.py), which then never
        writes the normalized activation to HBM."""
        parts = x if isinstance(x, tuple) else (x,)
        C = sum(p.shape[-1] for p in parts)
        G = self.num_groups
        gs = C // G
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)

        def affine(p, scale_p, bias_p):
            # Group stats of a group-aligned slice with its own sliced
            # params equal the concat's stats sliced: statistics never
            # straddle a part boundary.
            Cp = p.shape[-1]
            assert Cp % gs == 0, "split GroupNorm requires group-aligned parts"
            Gp = Cp // gs
            xg = p.reshape(p.shape[0], -1, Gp, gs)
            x32 = xg.astype(jnp.float32)
            m = jnp.mean(x32, axis=(1, 3))
            m2 = jnp.mean(jnp.square(x32), axis=(1, 3))
            rstd = jax.lax.rsqrt(
                jnp.maximum(m2 - jnp.square(m), 0.0) + self.epsilon)
            a = rstd[:, :, None] * scale_p.reshape(Gp, gs)[None]  # [B,Gp,gs]
            b = bias_p.reshape(Gp, gs)[None] - m[:, :, None] * a
            return x32, a, b

        outs, affs, off = [], [], 0
        for p in parts:
            Cp = p.shape[-1]
            x32, a, b = affine(p, scale[off:off + Cp], bias[off:off + Cp])
            if return_affine:
                affs.append((a.reshape(a.shape[0], Cp),
                             b.reshape(b.shape[0], Cp)))
            else:
                y = x32 * a[:, None] + b[:, None]
                outs.append(y.astype(p.dtype).reshape(p.shape))
            off += Cp
        if return_affine:
            return (jnp.concatenate([a for a, _ in affs], axis=-1),
                    jnp.concatenate([b for _, b in affs], axis=-1))
        return tuple(outs) if isinstance(x, tuple) else outs[0]


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in AT LEAST float32
    (ref: guided_diffusion/nn.py:17-19, 93-100 — the reference casts to
    f32). f32/f64 torsos keep flax's GroupNorm with the reference's exact
    operation ordering (bit-level parity paths; a float64 torso normalizes
    in f64 so double-precision parity runs don't quantize activations
    through the norm). Low-precision torsos (bf16/f16) use the fused
    f32-statistics path above — same f32 math, no materialized f32 copies.
    Both branches put their (C,) scale/bias under the same "GroupNorm_0"
    collection so checkpoints and converters are dtype-agnostic."""
    num_groups: int = 32

    @nn.compact
    def __call__(self, x, return_affine: bool = False):
        orig_dtype = (x[0] if isinstance(x, tuple) else x).dtype
        if orig_dtype in (jnp.float32, jnp.float64):
            assert not isinstance(x, tuple) and not return_affine, \
                "split-skip/fused-prologue inputs only arise on low-precision torsos"
            y = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5,
                             dtype=orig_dtype, param_dtype=orig_dtype,
                             name="GroupNorm_0")(x)
            return y.astype(orig_dtype)
        return _FusedGroupNorm(num_groups=self.num_groups,
                               name="GroupNorm_0")(x, return_affine)


class SplitSkipConv(nn.Module):
    """Conv whose input may arrive as a (h, skip) channel-split pair.

    Parameter layout is identical to `nn.Conv` (kernel [kh, kw, Cin, F],
    bias [F], param_dtype f32), so checkpoints are interchangeable with the
    concat form. For a plain array input the math replays nn.Conv exactly
    (same promote-to-dtype, same lax conv, same bias add). For a pair it
    computes conv(concat(a, b), W) as conv(a, W[:, :, :Ca]) +
    conv(b, W[:, :, Ca:]) in the torso dtype (each conv still accumulates
    f32 on the MXU; only the cross-half add rounds — one extra bf16
    rounding vs the fused conv). The concatenated tensor never exists in
    HBM, and on v5e the two Cin-half convs tile better than one double-Cin
    conv (57.9 -> 78.3 TFLOP/s at the 256px decoder shape; RESULTS.md
    'split-skip decoder'). preferred_element_type=f32 accumulation was
    measured equivalent-speed but is avoided: jax's conv transpose rule
    rejects the mixed f32-cotangent/bf16-kernel vjp it creates.

    `winograd=True` routes an eligible call (3x3 kernel, stride 1, even
    H/W) through the Winograd F(2,3) formulation
    (ops/experimental/winograd.py; measured-negative, off by default) —
    2.25x fewer MXU FLOPs, bf16-safe transform coefficients, identical
    param layout. Ineligible calls silently take the direct path."""
    features: int
    kernel_size: int = 3
    zero_init: bool = False
    dtype: Any = jnp.float32
    winograd: bool = False

    @nn.compact
    def __call__(self, x, prologue=None):
        """prologue=(a, b) ([B, Cin] f32 each): fuse silu(x*a + b) into the
        conv's input load (Winograd path; ops/experimental/winograd_pallas.py). The
        ineligible fallback applies the same composition unfused."""
        parts = x if isinstance(x, tuple) else (x,)
        cin = sum(p.shape[-1] for p in parts)
        k = self.kernel_size
        init = (nn.initializers.zeros if self.zero_init
                else nn.initializers.lecun_normal())
        kernel32 = self.param("kernel", init, (k, k, cin, self.features),
                              jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        kernel = kernel32.astype(self.dtype)
        bias = bias.astype(self.dtype)

        if (self.winograd and k == 3
                and parts[0].shape[1] % 2 == 0
                and parts[0].shape[2] % 2 == 0):
            from kdip_tpu.ops.experimental import winograd as _wino
            # transform from the f32 masters (one rounding, into V) — XLA
            # hoists the constant-weight transform out of the sampling scan
            y = _wino.winograd_conv3x3(
                tuple(p.astype(self.dtype) for p in parts)
                if isinstance(x, tuple) else x.astype(self.dtype),
                kernel32, dtype=self.dtype, prologue=prologue)
            return y + bias.reshape((1,) * (y.ndim - 1) + (-1,))

        if prologue is not None:
            from kdip_tpu.ops.experimental.winograd_pallas import _affine_silu
            parts = _affine_silu(
                tuple(p.astype(self.dtype) for p in parts), *prologue)
            x = parts if isinstance(x, tuple) else parts[0]

        pad = [(k // 2, k // 2)] * 2
        dn = jax.lax.conv_dimension_numbers(
            parts[0].shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))

        if not isinstance(x, tuple):
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel, (1, 1), pad,
                dimension_numbers=dn)
            return y + bias.reshape((1,) * (y.ndim - 1) + (-1,))

        acc, off = None, 0
        for p in parts:
            cp = p.shape[-1]
            y = jax.lax.conv_general_dilated(
                p.astype(self.dtype), kernel[:, :, off:off + cp], (1, 1),
                pad, dimension_numbers=dn)
            acc = y if acc is None else acc + y
            off += cp
        return acc + bias.reshape((1,) * (acc.ndim - 1) + (-1,))


def conv3x3(features: int, dtype=jnp.float32, name: Optional[str] = None,
            zero_init: bool = False, stride: int = 1) -> nn.Conv:
    init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    return nn.Conv(features, (3, 3), strides=(stride, stride), padding=1,
                   kernel_init=init,
                   bias_init=nn.initializers.zeros,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


def conv1x1(features: int, dtype=jnp.float32, name: Optional[str] = None,
            zero_init: bool = False) -> nn.Conv:
    init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    return nn.Conv(features, (1, 1),
                   kernel_init=init, bias_init=nn.initializers.zeros,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


class Upsample(nn.Module):
    """2x nearest-neighbor upsample + optional 3x3 conv
    (ref: guided_diffusion/unet.py:81-110)."""
    channels: int
    use_conv: bool = True
    out_channels: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        assert C == self.channels
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.use_conv:
            x = conv3x3(self.out_channels or self.channels, self.dtype, name="conv")(x)
        return x


class Downsample(nn.Module):
    """2x downsample via strided 3x3 conv or 2x2 avg-pool
    (ref: guided_diffusion/unet.py:113-140)."""
    channels: int
    use_conv: bool = True
    out_channels: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert x.shape[-1] == self.channels
        if self.use_conv:
            return conv3x3(self.out_channels or self.channels, self.dtype,
                           name="op", stride=2)(x)
        assert (self.out_channels or self.channels) == self.channels
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ResBlock(nn.Module):
    """ADM residual block with timestep-embedding FiLM conditioning
    (ref: guided_diffusion/unet.py:143-257)."""
    channels: int
    emb_channels: int
    dropout: float = 0.0
    out_channels: Optional[int] = None
    use_conv: bool = False  # 3x3 skip instead of 1x1 when channels change
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: Any = jnp.float32
    winograd: bool = False  # route 3x3 stride-1 convs via F(2,3)

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        """x: [B, H, W, C] — or a (h, skip) channel pair whose concat the
        block would otherwise consume (the decoder's split-skip fast path:
        norm/silu/conv run per half with sliced params, mathematically the
        concat computation, but the concat never materializes)."""
        out_ch = self.out_channels or self.channels
        is_split = isinstance(x, tuple)

        def c3(features, name, zero_init=False):
            """3x3 stride-1 conv; SplitSkipConv replays nn.Conv exactly on
            plain arrays (same param names), so the winograd routing flag
            never changes the checkpoint tree."""
            if self.winograd:
                return SplitSkipConv(features, 3, zero_init=zero_init,
                                     dtype=self.dtype, winograd=True,
                                     name=name)
            return conv3x3(features, self.dtype, name=name,
                           zero_init=zero_init)

        def resample(h):
            if self.up:
                return jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            if self.down:
                return nn.avg_pool(h, (2, 2), strides=(2, 2))
            return h

        # fused norm->silu->conv prologue (Winograd kernel): the normalized
        # activation never reaches HBM. Down-blocks can't fuse in_conv
        # (avg-pool between silu and conv doesn't commute with the
        # nonlinearity) but their out_conv still fuses; up-blocks fuse
        # fully: nearest-repeat commutes with pointwise ops, so
        # silu(gn(x)) upsampled == the prologue applied to upsampled x
        # with the ORIGINAL x's group statistics. No live dropout.
        no_dropout = deterministic or self.dropout == 0.0
        fuse_norm = self.winograd and not self.down and no_dropout
        fuse_out = self.winograd and no_dropout

        if fuse_norm:
            aff = GroupNorm32(name="in_norm")(x, return_affine=True)
            if self.up:
                x = resample(x)
            h = SplitSkipConv(out_ch, 3, dtype=self.dtype, winograd=True,
                              name="in_conv")(x, prologue=aff)
        elif is_split:
            assert not (self.up or self.down), \
                "split-skip input only supported for non-resampling blocks"
            h = GroupNorm32(name="in_norm")(x)
            h = tuple(nn.silu(p) for p in h)
            h = SplitSkipConv(out_ch, 3, dtype=self.dtype,
                              winograd=self.winograd, name="in_conv")(h)
        else:
            h = nn.silu(GroupNorm32(name="in_norm")(x))
            if self.up or self.down:
                h = resample(h)
                x = resample(x)
            h = c3(out_ch, "in_conv")(h)

        emb_out = nn.Dense(2 * out_ch if self.use_scale_shift_norm else out_ch,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="emb_proj")(nn.silu(emb))
        emb_out = emb_out[:, None, None, :].astype(h.dtype)

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            if fuse_out:
                # absorb the FiLM scale/shift into the affine:
                # (gn(h)*(1+s) + t) = h*(a*(1+s)) + (b*(1+s) + t)
                a, b = GroupNorm32(name="out_norm")(h, return_affine=True)
                s32 = scale[:, 0, 0, :].astype(jnp.float32)
                t32 = shift[:, 0, 0, :].astype(jnp.float32)
                aff2 = (a * (1 + s32), b * (1 + s32) + t32)
                h = SplitSkipConv(out_ch, 3, dtype=self.dtype, winograd=True,
                                  zero_init=True, name="out_conv")(
                                      h, prologue=aff2)
            else:
                h = GroupNorm32(name="out_norm")(h) * (1 + scale) + shift
                h = nn.silu(h)
                h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
                h = c3(out_ch, "out_conv", zero_init=True)(h)
        else:
            h = h + emb_out
            if fuse_out:
                aff2 = GroupNorm32(name="out_norm")(h, return_affine=True)
                h = SplitSkipConv(out_ch, 3, dtype=self.dtype, winograd=True,
                                  zero_init=True, name="out_conv")(
                                      h, prologue=aff2)
            else:
                h = nn.silu(GroupNorm32(name="out_norm")(h))
                h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
                h = c3(out_ch, "out_conv", zero_init=True)(h)

        if is_split:
            assert out_ch != self.channels, \
                "split-skip input requires a projecting skip connection"
            skip = SplitSkipConv(out_ch, 3 if self.use_conv else 1,
                                 dtype=self.dtype, winograd=self.winograd,
                                 name="skip")(x)
        elif out_ch == self.channels:
            skip = x
        elif self.use_conv:
            skip = c3(out_ch, "skip")(x)
        else:
            skip = conv1x1(out_ch, self.dtype, name="skip")(x)
        return skip + h


class AttentionBlock(nn.Module):
    """Spatial self-attention over flattened positions
    (ref: guided_diffusion/unet.py:260-395).

    Implements both head-split orders: "legacy" (split heads before qkv,
    QKVAttentionLegacy, unet.py:330-356) and "new" (QKVAttention,
    unet.py:363-391). Softmax in float32 as the reference does.
    """
    channels: int
    num_heads: int = 1
    num_head_channels: int = -1
    use_new_attention_order: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        if self.num_head_channels == -1:
            heads = self.num_heads
        else:
            assert C % self.num_head_channels == 0
            heads = C // self.num_head_channels
        ch = C // heads
        T = H * W

        h = x.reshape(B, T, C)
        h_norm = GroupNorm32(name="norm")(h)
        qkv = nn.Dense(3 * C, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(h_norm)  # [B, T, 3C]
        if self.use_new_attention_order:
            # split qkv first, then heads (unet.py:379-390)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, T, heads, ch)
            k = k.reshape(B, T, heads, ch)
            v = v.reshape(B, T, heads, ch)
        else:
            # split heads first, then qkv within each head (unet.py:346-355)
            qkv = qkv.reshape(B, T, heads, 3 * ch)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = 1 / math.sqrt(math.sqrt(ch))
        # accumulate logits in at least f32 (f64 when the torso is f64,
        # matching the reference's einsum in model dtype, unet.py:351-353);
        # softmax stays f32 like the reference's weight.float()
        acc = jnp.float64 if self.dtype == jnp.float64 else jnp.float32
        logits = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale,
                            preferred_element_type=acc)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        a = jnp.einsum("bhts,bshc->bthc", weights, v)
        a = a.reshape(B, T, C)
        a = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=nn.initializers.zeros, name="proj_out")(a)
        return ((h + a).reshape(B, H, W, C)).astype(x.dtype)
