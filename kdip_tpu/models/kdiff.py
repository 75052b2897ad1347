"""k-diffusion native UNets (ImageDenoiserModelV1/V2) in Flax, TPU-native.

Equivalent of `k_diffusion/models/image_v1.py` / `image_v2.py` and the
conditioned-module layer library (`k_diffusion/layers.py:89-284`): AdaGN
FiLM conditioning, Fourier sigma embedding, FIR up/downsampling, pixel
shuffle patching, and the `(x0, logvar[, logvar_ot])` variance outputs used
by the DCT-Var model (configs/train_ffhq_dct.json).

NHWC layout; attention as MXU einsums; FIR resampling as depthwise convs.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


_FIR_KERNELS = {
    "linear": [1 / 8, 3 / 8, 3 / 8, 1 / 8],
    "cubic": [-0.01171875, -0.03515625, 0.11328125, 0.43359375,
              0.43359375, 0.11328125, -0.03515625, -0.01171875],
}


class FourierFeatures(nn.Module):
    """Random Fourier features (ref: k_diffusion/layers.py:257-265).
    The projection is a fixed random buffer in the reference; here a
    non-trainable param initialized N(0, std^2)."""
    out_features: int
    std: float = 1.0

    @nn.compact
    def __call__(self, x):  # x: [B, in_features]
        assert self.out_features % 2 == 0
        w = self.param("weight", lambda key, shape: jax.random.normal(key, shape) * self.std,
                       (self.out_features // 2, x.shape[-1]))
        f = 2 * math.pi * x @ w.T
        return jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)


class AdaGN(nn.Module):
    """Adaptive GroupNorm (ref: k_diffusion/layers.py:135-146):
    group_norm(x) * (1 + W c) + b c."""
    c_out: int
    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, cond):
        wb = nn.Dense(self.c_out * 2, name="mapper")(cond)
        weight, bias = jnp.split(wb, 2, axis=-1)
        x = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps,
                         use_bias=False, use_scale=False)(x)
        return x * (weight[:, None, None, :] + 1) + bias[:, None, None, :]


class SelfAttention2d(nn.Module):
    """(ref: k_diffusion/layers.py:151-170)"""
    c_in: int
    n_head: int
    norm_groups: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, cond, deterministic: bool = True):
        B, H, W, C = x.shape
        h = AdaGN(self.c_in, self.norm_groups, name="norm_in")(x, cond)
        qkv = nn.Conv(C * 3, (1, 1), name="qkv_proj")(h)
        qkv = qkv.reshape(B, H * W, 3 * self.n_head, C // self.n_head)
        q, k, v = jnp.split(qkv, 3, axis=2)
        scale = (C // self.n_head) ** -0.25
        att = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale,
                         preferred_element_type=jnp.float32)
        att = jax.nn.softmax(att, axis=-1).astype(v.dtype)
        att = nn.Dropout(self.dropout_rate)(att, deterministic=deterministic)
        y = jnp.einsum("bhts,bshc->bthc", att, v).reshape(B, H, W, C)
        return x + nn.Conv(C, (1, 1), name="out_proj")(y)


class CrossAttention2d(nn.Module):
    """Cross-attention from 2-D features to an encoder sequence
    (ref: k_diffusion/layers.py:173-202): queries from AdaGN-normalized
    pixels, keys/values from a LayerNorm'd conditioning sequence, additive
    -1e4 masking of padded positions."""
    c_dec: int
    c_enc: int
    n_head: int
    norm_groups: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, cond, cross, cross_padding, deterministic: bool = True):
        B, H, W, C = x.shape
        q = nn.Conv(C, (1, 1), name="q_proj")(
            AdaGN(self.c_dec, self.norm_groups, name="norm_dec")(x, cond))
        q = q.reshape(B, H * W, self.n_head, C // self.n_head)
        enc = nn.LayerNorm(name="norm_enc")(cross)
        kv = nn.Dense(C * 2, name="kv_proj")(enc)
        kv = kv.reshape(B, -1, 2 * self.n_head, C // self.n_head)
        k, v = jnp.split(kv, 2, axis=2)
        scale = (C // self.n_head) ** -0.25
        att = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale,
                         preferred_element_type=jnp.float32)
        att = att - cross_padding[:, None, None, :] * 10000
        att = jax.nn.softmax(att, axis=-1).astype(v.dtype)
        att = nn.Dropout(self.dropout_rate)(att, deterministic=deterministic)
        y = jnp.einsum("bhts,bshc->bthc", att, v).reshape(B, H, W, C)
        return x + nn.Conv(C, (1, 1), name="out_proj")(y)


def _fir_kernel_2d(name: str, scale: float = 1.0) -> jnp.ndarray:
    k1 = jnp.asarray(_FIR_KERNELS[name]) * scale
    return jnp.outer(k1, k1)


class Downsample2d(nn.Module):
    """FIR antialiased 2x downsample (ref: k_diffusion/layers.py:223-236)."""
    kernel: str = "linear"

    @nn.compact
    def __call__(self, x):
        k2 = _fir_kernel_2d(self.kernel)
        pad = k2.shape[0] // 2 - 1
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
        C = x.shape[-1]
        w = jnp.tile(k2[..., None, None], (1, 1, 1, C)).astype(x.dtype)
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


class Upsample2d(nn.Module):
    """FIR 2x upsample via zero-insertion + conv
    (ref: k_diffusion/layers.py:239-252)."""
    kernel: str = "linear"

    @nn.compact
    def __call__(self, x):
        k2 = _fir_kernel_2d(self.kernel, scale=2.0)
        ksize = k2.shape[0]
        pad = ksize // 2 - 1
        # reflect-pad by (pad+1)//2, zero-insert (stride-2 transpose), then
        # VALID conv reproduces torch ConvTranspose2d(stride=2, padding=2*pad+1)
        p = (pad + 1) // 2
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        x = jax.lax.pad(x, jnp.zeros((), x.dtype),
                        [(0, 0, 0), (0, 0, 1), (0, 0, 1), (0, 0, 0)])
        C = x.shape[-1]
        w = jnp.tile(k2[..., None, None], (1, 1, 1, C)).astype(x.dtype)
        eff_pad = ksize - 1 - (2 * pad + 1)
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(eff_pad, eff_pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


class ResConvBlock(nn.Module):
    """(ref: k_diffusion/models/image_v2.py:16-28)"""
    c_in: int
    c_mid: int
    c_out: int
    group_size: int = 32
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, cond, deterministic: bool = True):
        h = AdaGN(self.c_in, max(1, self.c_in // self.group_size),
                  name="norm_1")(x, cond)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.c_mid, (3, 3), padding=1, name="conv_1")(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = AdaGN(self.c_mid, max(1, self.c_mid // self.group_size),
                  name="norm_2")(h, cond)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.c_out, (3, 3), padding=1, name="conv_2")(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        if self.c_in == self.c_out:
            skip = x
        else:
            skip = nn.Conv(self.c_out, (1, 1), use_bias=False,
                           kernel_init=nn.initializers.orthogonal(),
                           name="skip")(x)
        return h + skip


class Level(nn.Module):
    """One D/U block: optional resample + n_layers res(+attention) layers
    (ref: image_v2.py:31-76 DBlock/UBlock)."""
    n_layers: int
    c_in: int
    c_mid: int
    c_out: int
    downsample: bool = False
    upsample: bool = False
    self_attn: bool = False
    group_size: int = 32
    head_size: int = 64
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, cond, deterministic: bool = True):
        if self.downsample:
            x = Downsample2d(name="down")(x)
        for i in range(self.n_layers):
            my_c_in = self.c_in if i == 0 else self.c_mid
            my_c_out = self.c_mid if i < self.n_layers - 1 else self.c_out
            x = ResConvBlock(my_c_in, self.c_mid, my_c_out, self.group_size,
                             self.dropout_rate, name=f"res_{i}")(
                x, cond, deterministic)
            if self.self_attn:
                x = SelfAttention2d(my_c_out, max(1, my_c_out // self.head_size),
                                    max(1, my_c_out // self.group_size),
                                    self.dropout_rate, name=f"attn_{i}")(
                    x, cond, deterministic)
        if self.upsample:
            x = Upsample2d(name="up")(x)
        return x


class ImageDenoiserModelV2(nn.Module):
    """(ref: k_diffusion/models/image_v2.py:88-158). Emits model_output or
    (model_output, logvar, logvar_ot) when has_variance."""
    c_in: int
    feats_in: int
    depths: Sequence[int]
    channels: Sequence[int]
    self_attn_depths: Sequence[bool]
    mapping_cond_dim: int = 0
    unet_cond_dim: int = 0
    dropout_rate: float = 0.0
    patch_size: int = 1
    skip_stages: int = 0
    has_variance: bool = False

    @nn.compact
    def __call__(self, x, sigma, mapping_cond=None, unet_cond=None,
                 return_variance: bool = False, deterministic: bool = True):
        sigma = jnp.broadcast_to(sigma, (x.shape[0],))
        c_noise = jnp.log(sigma) / 4
        te = FourierFeatures(self.feats_in, name="timestep_embed")(c_noise[:, None])
        if mapping_cond is not None:
            te = te + nn.Dense(self.feats_in, use_bias=False,
                               name="mapping_cond")(mapping_cond)
        cond = te
        for i in range(2):  # MappingNet (ref: image_v2.py:79-85)
            cond = nn.gelu(nn.Dense(self.feats_in,
                                    kernel_init=nn.initializers.orthogonal(),
                                    name=f"mapping_{i}")(cond),
                           approximate=False)

        if unet_cond is not None:
            x = jnp.concatenate([x, unet_cond], axis=-1)
        ps = self.patch_size
        if ps > 1:  # pixel_unshuffle
            B, H, W, C = x.shape
            x = x.reshape(B, H // ps, ps, W // ps, ps, C)
            x = x.transpose(0, 1, 3, 5, 2, 4).reshape(B, H // ps, W // ps,
                                                      C * ps * ps)
        h = nn.Conv(self.channels[max(0, self.skip_stages - 1)], (1, 1),
                    name="proj_in")(x)

        n = len(self.depths)
        skips = []
        for i in range(self.skip_stages, n):
            my_c_in = self.channels[max(0, i - 1)]
            h = Level(self.depths[i], my_c_in, self.channels[i], self.channels[i],
                      downsample=i > self.skip_stages,
                      self_attn=self.self_attn_depths[i],
                      dropout_rate=self.dropout_rate, name=f"d_block_{i}")(
                h, cond, deterministic)
            skips.append(h)
        for j, i in enumerate(range(n - 1, self.skip_stages - 1, -1)):
            my_c_in = self.channels[i] * 2 if i < n - 1 else self.channels[i]
            my_c_out = self.channels[max(0, i - 1)]
            if j > 0:
                h = jnp.concatenate([h, skips[i - self.skip_stages]], axis=-1)
            h = Level(self.depths[i], my_c_in, self.channels[i], my_c_out,
                      upsample=i > self.skip_stages,
                      self_attn=self.self_attn_depths[i],
                      dropout_rate=self.dropout_rate, name=f"u_block_{i}")(
                h, cond, deterministic)

        out_ch = self.c_in * ps * ps * (3 if self.has_variance else 1)
        h = nn.Conv(out_ch, (1, 1), kernel_init=nn.initializers.zeros,
                    name="proj_out")(h)
        if self.has_variance:
            h, logvar, logvar_ot = jnp.split(h, 3, axis=-1)
        if ps > 1:  # pixel_shuffle
            B, H, W, C = h.shape
            h = h.reshape(B, H, W, C // (ps * ps), ps, ps)
            h = h.transpose(0, 1, 4, 2, 5, 3).reshape(B, H * ps, W * ps,
                                                      C // (ps * ps))
        if self.has_variance and return_variance:
            if ps > 1:
                def unshuffle_back(v):
                    B, H, W, C = v.shape
                    v = v.reshape(B, H, W, C // (ps * ps), ps, ps)
                    return v.transpose(0, 1, 4, 2, 5, 3).reshape(
                        B, H * ps, W * ps, C // (ps * ps))
                logvar, logvar_ot = unshuffle_back(logvar), unshuffle_back(logvar_ot)
            return h, logvar, logvar_ot
        return h


def karras_augment_wrapper(model_apply):
    """Feeds the 9-dim augmentation conditioning into the mapping net
    (ref: k_diffusion/augmentation.py:89-101 KarrasAugmentWrapper):
    aug_cond defaults to zeros; an extra mapping_cond concatenates after it.

    model_apply(params, x, sigma, mapping_cond=...) -> output.
    """
    def apply(params, x, sigma, aug_cond=None, mapping_cond=None, **kwargs):
        if aug_cond is None:
            aug_cond = jnp.zeros((x.shape[0], 9), x.dtype)
        if mapping_cond is None:
            mapping_cond = aug_cond
        else:
            mapping_cond = jnp.concatenate([aug_cond, mapping_cond], axis=1)
        return model_apply(params, x, sigma, mapping_cond=mapping_cond, **kwargs)
    return apply


class ImageDenoiserModelV1(nn.Module):
    """(ref: k_diffusion/models/image_v1.py:87-156). The variance variant
    emits a single scalar logvar per image (image_v1.py:131-132)."""
    c_in: int
    feats_in: int
    depths: Sequence[int]
    channels: Sequence[int]
    self_attn_depths: Sequence[bool]
    mapping_cond_dim: int = 0
    unet_cond_dim: int = 0
    dropout_rate: float = 0.0
    patch_size: int = 1
    skip_stages: int = 0
    has_variance: bool = False

    @nn.compact
    def __call__(self, x, sigma, mapping_cond=None, unet_cond=None,
                 return_variance: bool = False, deterministic: bool = True):
        sigma = jnp.broadcast_to(sigma, (x.shape[0],))
        c_noise = jnp.log(sigma) / 4
        te = FourierFeatures(self.feats_in, name="timestep_embed")(c_noise[:, None])
        if mapping_cond is not None:
            te = te + nn.Dense(self.feats_in, use_bias=False,
                               name="mapping_cond")(mapping_cond)
        cond = te
        for i in range(2):
            cond = nn.gelu(nn.Dense(self.feats_in,
                                    kernel_init=nn.initializers.orthogonal(),
                                    name=f"mapping_{i}")(cond),
                           approximate=False)

        if unet_cond is not None:
            x = jnp.concatenate([x, unet_cond], axis=-1)
        ps = self.patch_size
        if ps > 1:
            B, H, W, C = x.shape
            x = x.reshape(B, H // ps, ps, W // ps, ps, C)
            x = x.transpose(0, 1, 3, 5, 2, 4).reshape(B, H // ps, W // ps,
                                                      C * ps * ps)
        h = nn.Conv(self.channels[max(0, self.skip_stages - 1)], (1, 1),
                    name="proj_in")(x)

        n = len(self.depths)
        skips = []
        for i in range(self.skip_stages, n):
            my_c_in = self.channels[max(0, i - 1)]
            h = Level(self.depths[i], my_c_in, self.channels[i], self.channels[i],
                      downsample=i > self.skip_stages,
                      self_attn=self.self_attn_depths[i],
                      dropout_rate=self.dropout_rate, name=f"d_block_{i}")(
                h, cond, deterministic)
            skips.append(h)
        for j, i in enumerate(range(n - 1, self.skip_stages - 1, -1)):
            my_c_in = self.channels[i] * 2 if i < n - 1 else self.channels[i]
            my_c_out = self.channels[max(0, i - 1)]
            if j > 0:
                h = jnp.concatenate([h, skips[i - self.skip_stages]], axis=-1)
            h = Level(self.depths[i], my_c_in, self.channels[i], my_c_out,
                      upsample=i > self.skip_stages,
                      self_attn=self.self_attn_depths[i],
                      dropout_rate=self.dropout_rate, name=f"u_block_{i}")(
                h, cond, deterministic)

        out_ch = self.c_in * ps * ps + (1 if self.has_variance else 0)
        h = nn.Conv(out_ch, (1, 1), kernel_init=nn.initializers.zeros,
                    name="proj_out")(h)
        if self.has_variance:
            # V1: one extra channel, averaged to a scalar logvar per image
            # (ref: image_v1.py:131-132)
            h, logvar_map = h[..., :-1], h[..., -1]
            logvar = jnp.mean(logvar_map.reshape(x.shape[0], -1), axis=1)
        if ps > 1:
            B, H, W, C = h.shape
            h = h.reshape(B, H, W, C // (ps * ps), ps, ps)
            h = h.transpose(0, 1, 4, 2, 5, 3).reshape(B, H * ps, W * ps,
                                                      C // (ps * ps))
        if self.has_variance and return_variance:
            return h, logvar
        return h
