"""ADM (guided-diffusion) UNet in Flax, TPU-native.

Re-implementation of the OpenAI guided-diffusion `UNetModel`
(ref: guided_diffusion/unet.py:398-668) with identical topology and math but
TPU-first design choices: NHWC layout, fp32 GroupNorm statistics with
configurable (bfloat16) compute dtype for the torso, attention as MXU einsum,
and a functional forward compatible with jit/vjp/scan.

The parameter tree mirrors the reference module structure one-to-one
(`input_blocks_{i}_{j}`, `middle_block_{j}`, `output_blocks_{i}_{j}`,
`time_embed_{1,2}`, `out_norm`/`out_conv`) so checkpoint conversion from the
published `.pt` files is a mechanical key/layout mapping (see kdip_tpu/ckpt.py).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

import math

from .layers import (AttentionBlock, Downsample, GroupNorm32, ResBlock,
                     Upsample, conv1x1, conv3x3, timestep_embedding)


class ADMUNet(nn.Module):
    """The full UNet with attention and timestep embedding
    (ref: guided_diffusion/unet.py:398-668).

    Layer list construction (levels, attention placement, up/downsampling)
    follows unet.py:482-618 exactly so that state dicts map 1:1.
    """
    image_size: int = 256
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 6
    num_res_blocks: int = 1
    attention_resolutions: Tuple[int, ...] = (16,)  # downsample rates
    dropout: float = 0.0
    channel_mult: Tuple[float, ...] = (1, 1, 2, 2, 4, 4)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 4
    num_head_channels: int = 64
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    use_new_attention_order: bool = False
    dtype: Any = jnp.float32
    # Decoder skip concats feed GroupNorm/SiLU/conv whose params all act
    # per-channel or per-group, so when the (h, skip) channel split is
    # group-aligned the whole chain runs on the halves with sliced params —
    # same math, no concat tensor in HBM, and two Cin-half convs tile better
    # on v5e than one double-Cin conv (RESULTS.md 'split-skip decoder').
    # Low-precision torsos only; f32/f64 parity paths keep the exact
    # concat op ordering.
    split_skip: bool = True
    # Route the ResBlocks' 3x3 stride-1 convs through Winograd F(2,3)
    # (ops/experimental/winograd.py): 2.25x fewer MXU FLOPs per conv, same
    # param tree. Measured-negative end-to-end on v5e (3.3x slower, HBM-bound
    # workload) — see ops/experimental/__init__.py for the revival condition.
    # Off by default pending end-to-end PSNR + throughput validation on
    # the chip; low-precision torsos only (f32 parity keeps lax convs).
    winograd: bool = False

    def setup(self):
        ch_mult = self.channel_mult
        mc = self.model_channels
        time_embed_dim = mc * 4
        heads_up = self.num_heads if self.num_heads_upsample == -1 else self.num_heads_upsample

        self.time_embed_1 = nn.Dense(time_embed_dim, dtype=self.dtype,
                                     param_dtype=jnp.float32)
        self.time_embed_2 = nn.Dense(time_embed_dim, dtype=self.dtype,
                                     param_dtype=jnp.float32)
        if self.num_classes is not None:
            self.label_emb = nn.Embed(self.num_classes, time_embed_dim,
                                      param_dtype=jnp.float32)

        wino = self.winograd and jnp.dtype(self.dtype) not in (
            jnp.dtype(jnp.float32), jnp.dtype(jnp.float64))

        def res(ch, out_ch=None, up=False, down=False):
            return ResBlock(channels=ch, emb_channels=time_embed_dim,
                            dropout=self.dropout, out_channels=out_ch,
                            use_scale_shift_norm=self.use_scale_shift_norm,
                            up=up, down=down, dtype=self.dtype,
                            winograd=wino)

        def attn(ch, heads):
            return AttentionBlock(channels=ch, num_heads=heads,
                                  num_head_channels=self.num_head_channels,
                                  use_new_attention_order=self.use_new_attention_order,
                                  dtype=self.dtype)

        # --- encoder (ref: unet.py:482-539) ---
        ch = input_ch = int(ch_mult[0] * mc)
        input_blocks = [[conv3x3(ch, self.dtype)]]
        input_block_chans = [ch]
        ds = 1
        for level, mult in enumerate(ch_mult):
            for _ in range(self.num_res_blocks):
                layers = [res(ch, int(mult * mc))]
                ch = int(mult * mc)
                if ds in self.attention_resolutions:
                    layers.append(attn(ch, self.num_heads))
                input_blocks.append(layers)
                input_block_chans.append(ch)
            if level != len(ch_mult) - 1:
                if self.resblock_updown:
                    input_blocks.append([res(ch, ch, down=True)])
                else:
                    input_blocks.append([Downsample(ch, self.conv_resample,
                                                    out_channels=ch, dtype=self.dtype)])
                input_block_chans.append(ch)
                ds *= 2
        self.input_blocks = input_blocks

        # --- middle (ref: unet.py:541-565) ---
        self.middle_block = [res(ch), attn(ch, self.num_heads), res(ch)]

        # --- decoder (ref: unet.py:568-612) ---
        output_blocks = []
        for level, mult in list(enumerate(ch_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                ich = input_block_chans.pop()
                layers = [res(ch + ich, int(mc * mult))]
                ch = int(mc * mult)
                if ds in self.attention_resolutions:
                    layers.append(attn(ch, heads_up))
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        layers.append(res(ch, ch, up=True))
                    else:
                        layers.append(Upsample(ch, self.conv_resample,
                                               out_channels=ch, dtype=self.dtype))
                    ds //= 2
                output_blocks.append(layers)
        self.output_blocks = output_blocks

        # --- head (ref: unet.py:614-618) ---
        self.out_norm = GroupNorm32()
        self.out_conv = conv3x3(self.out_channels, self.dtype, zero_init=True)

    def _apply_layers(self, layers, h, emb, deterministic):
        for layer in layers:
            if isinstance(layer, ResBlock):
                h = layer(h, emb, deterministic=deterministic)
            else:
                h = layer(h)
        return h

    def _split_skip_ok(self, ca: int, cb: int, out_ch: int) -> bool:
        """Static gate for the decoder split-skip path: low-precision torso,
        32-group-aligned channel split, and a projecting skip conv."""
        if not self.split_skip:
            return False
        if jnp.dtype(self.dtype) in (jnp.dtype(jnp.float32),
                                     jnp.dtype(jnp.float64)):
            return False
        c = ca + cb
        gs = c // 32
        return (c % 32 == 0 and ca % gs == 0 and cb % gs == 0
                and out_ch != c)

    def __call__(self, x, timesteps, y=None, return_feature: bool = False,
                 deterministic: bool = True):
        """x: [B, H, W, C] NHWC in [-1, 1]; timesteps: [B] (may be fractional).

        Returns [B, H, W, out_channels]; with return_feature also the
        penultimate feature map (ref: unet.py:636-668).
        """
        assert (y is not None) == (self.num_classes is not None)
        emb = timestep_embedding(timesteps, self.model_channels, dtype=self.dtype)
        emb = self.time_embed_2(nn.silu(self.time_embed_1(emb)))
        if self.num_classes is not None:
            emb = emb + self.label_emb(y)

        h = x.astype(self.dtype)
        hs = []
        for layers in self.input_blocks:
            h = self._apply_layers(layers, h, emb, deterministic)
            hs.append(h)
        h = self._apply_layers(self.middle_block, h, emb, deterministic)
        for layers in self.output_blocks:
            skip = hs.pop()
            if self._split_skip_ok(h.shape[-1], skip.shape[-1],
                                   layers[0].out_channels
                                   or layers[0].channels):
                h = (h, skip)  # consumed split by the leading ResBlock
            else:
                h = jnp.concatenate([h, skip], axis=-1)
            h = self._apply_layers(layers, h, emb, deterministic)
        h = h.astype(x.dtype)
        out = self.out_conv(nn.silu(self.out_norm(h)))
        out = out.astype(x.dtype)
        if return_feature:
            return out, h
        return out


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling (ref: guided_diffusion/unet.py:22-63).

    Tokens-last layout: the mean token is prepended, a learned positional
    embedding added, one multi-head attention pass run (new head order, as the
    reference's QKVAttention), and the mean-token output projected.
    """
    embed_dim: int
    num_head_channels: int
    output_dim: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        assert C == self.embed_dim
        T = H * W
        tokens = x.reshape(B, T, C)
        tokens = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens],
                                 axis=1)  # [B, T+1, C]
        # ref stores [C, T+1]; conversion transposes (ckpt.py)
        pos = self.param("positional_embedding",
                         lambda k: jax.random.normal(k, (T + 1, C)) / C ** 0.5)
        tokens = tokens + pos[None].astype(tokens.dtype)
        qkv = nn.Dense(3 * C, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv_proj")(tokens)
        heads = C // self.num_head_channels
        ch = C // heads
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T + 1, heads, ch)
        k = k.reshape(B, T + 1, heads, ch)
        v = v.reshape(B, T + 1, heads, ch)
        scale = 1 / math.sqrt(math.sqrt(ch))
        # accumulate logits in at least f32 (f64 when the torso is f64,
        # matching the reference's einsum in model dtype, unet.py:351-353);
        # softmax stays f32 like the reference's weight.float()
        acc = jnp.float64 if self.dtype == jnp.float64 else jnp.float32
        logits = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale,
                            preferred_element_type=acc)
        weights = jax.nn.softmax(logits.astype(jnp.float32),
                                 axis=-1).astype(v.dtype)
        a = jnp.einsum("bhts,bshc->bthc", weights, v).reshape(B, T + 1, C)
        out = nn.Dense(self.output_dim or C, dtype=self.dtype,
                       param_dtype=jnp.float32, name="c_proj")(a)
        return out[:, 0]


class EncoderADMUNet(nn.Module):
    """The half-UNet classifier (ref: guided_diffusion/unet.py:688-899
    EncoderUNetModel): encoder + middle block of the ADM UNet with a pooling
    head ('adaptive' | 'attention' | 'spatial' | 'spatial_v2'). Drives the
    classifier-guidance hooks `condition_mean`/`condition_score`
    (gaussian_diffusion.py:356-393; ours in ddpm_sampling.py)."""
    image_size: int = 64
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 1000
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (2, 4, 8)
    dropout: float = 0.0
    channel_mult: Tuple[float, ...] = (1, 2, 3, 4)
    conv_resample: bool = True
    num_heads: int = 1
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    use_new_attention_order: bool = False
    pool: str = "attention"
    dtype: Any = jnp.float32

    def setup(self):
        ch_mult = self.channel_mult
        mc = self.model_channels
        time_embed_dim = mc * 4
        self.time_embed_1 = nn.Dense(time_embed_dim, dtype=self.dtype,
                                     param_dtype=jnp.float32)
        self.time_embed_2 = nn.Dense(time_embed_dim, dtype=self.dtype,
                                     param_dtype=jnp.float32)

        def res(ch, out_ch=None, down=False):
            return ResBlock(channels=ch, emb_channels=time_embed_dim,
                            dropout=self.dropout, out_channels=out_ch,
                            use_scale_shift_norm=self.use_scale_shift_norm,
                            down=down, dtype=self.dtype)

        def attn(ch):
            return AttentionBlock(channels=ch, num_heads=self.num_heads,
                                  num_head_channels=self.num_head_channels,
                                  use_new_attention_order=self.use_new_attention_order,
                                  dtype=self.dtype)

        # encoder, same layer-list construction as the full UNet
        # (ref: unet.py:743-800)
        ch = int(ch_mult[0] * mc)
        input_blocks = [[conv3x3(ch, self.dtype)]]
        ds = 1
        feature_size = ch
        for level, mult in enumerate(ch_mult):
            for _ in range(self.num_res_blocks):
                layers = [res(ch, int(mult * mc))]
                ch = int(mult * mc)
                if ds in self.attention_resolutions:
                    layers.append(attn(ch))
                input_blocks.append(layers)
                feature_size += ch
            if level != len(ch_mult) - 1:
                if self.resblock_updown:
                    input_blocks.append([res(ch, ch, down=True)])
                else:
                    input_blocks.append([Downsample(ch, self.conv_resample,
                                                    out_channels=ch,
                                                    dtype=self.dtype)])
                ds *= 2
                feature_size += ch
        self.input_blocks = input_blocks
        self.middle_block = [res(ch), attn(ch), res(ch)]
        feature_size += ch
        self._ds = ds
        self._ch = ch

        if self.pool == "adaptive":
            self.out_norm = GroupNorm32()
            self.out_proj = conv1x1(self.out_channels, self.dtype,
                                    zero_init=True)
        elif self.pool == "attention":
            assert self.num_head_channels != -1
            self.out_norm = GroupNorm32()
            self.out_pool = AttentionPool2d(embed_dim=ch,
                                            num_head_channels=self.num_head_channels,
                                            output_dim=self.out_channels,
                                            dtype=self.dtype)
        elif self.pool in ("spatial", "spatial_v2"):
            self.out_fc1 = nn.Dense(2048, dtype=self.dtype,
                                    param_dtype=jnp.float32)
            if self.pool == "spatial_v2":
                self.out_norm = GroupNorm32()
            self.out_fc2 = nn.Dense(self.out_channels, dtype=self.dtype,
                                    param_dtype=jnp.float32)
        else:
            raise NotImplementedError(f"Unexpected {self.pool} pooling")

    def _apply_layers(self, layers, h, emb, deterministic):
        for layer in layers:
            if isinstance(layer, ResBlock):
                h = layer(h, emb, deterministic=deterministic)
            else:
                h = layer(h)
        return h

    def __call__(self, x, timesteps, deterministic: bool = True):
        """x: [B, H, W, C]; timesteps: [B]. Returns [B, out_channels] logits
        (ref: unet.py:880-899)."""
        emb = timestep_embedding(timesteps, self.model_channels,
                                 dtype=self.dtype)
        emb = self.time_embed_2(nn.silu(self.time_embed_1(emb)))

        h = x.astype(self.dtype)
        results = []
        for layers in self.input_blocks:
            h = self._apply_layers(layers, h, emb, deterministic)
            if self.pool.startswith("spatial"):
                results.append(h.astype(x.dtype).mean(axis=(1, 2)))
        h = self._apply_layers(self.middle_block, h, emb, deterministic)
        if self.pool.startswith("spatial"):
            results.append(h.astype(x.dtype).mean(axis=(1, 2)))
            h = jnp.concatenate(results, axis=-1)
            h = self.out_fc1(h)
            if self.pool == "spatial_v2":
                h = nn.silu(self.out_norm(h))
            else:
                h = jax.nn.relu(h)
            return self.out_fc2(h).astype(x.dtype)
        h = h.astype(x.dtype)
        h = nn.silu(self.out_norm(h))
        if self.pool == "adaptive":
            h = h.mean(axis=(1, 2), keepdims=True)
            h = self.out_proj(h)
            return h.reshape(h.shape[0], -1)
        return self.out_pool(h).astype(x.dtype)


def create_classifier(image_size: int = 64, classifier_use_fp16: bool = False,
                      classifier_width: int = 128, classifier_depth: int = 2,
                      classifier_attention_resolutions: str = "32,16,8",
                      classifier_use_scale_shift_norm: bool = True,
                      classifier_resblock_updown: bool = True,
                      classifier_pool: str = "attention",
                      out_channels: int = 1000) -> EncoderADMUNet:
    """Flag-compatible classifier factory
    (ref: guided_diffusion/script_util.py:27-41, 228-267)."""
    channel_mult = {512: (0.5, 1, 1, 2, 2, 4, 4), 256: (1, 1, 2, 2, 4, 4),
                    128: (1, 1, 2, 3, 4), 64: (1, 2, 3, 4)}[image_size]
    attention_ds = tuple(image_size // int(r)
                         for r in classifier_attention_resolutions.split(","))
    return EncoderADMUNet(
        image_size=image_size, in_channels=3, model_channels=classifier_width,
        out_channels=out_channels, num_res_blocks=classifier_depth,
        attention_resolutions=attention_ds, channel_mult=channel_mult,
        num_head_channels=64,
        use_scale_shift_norm=classifier_use_scale_shift_norm,
        resblock_updown=classifier_resblock_updown, pool=classifier_pool,
        dtype=jnp.bfloat16 if classifier_use_fp16 else jnp.float32)


class SuperResADMUNet(nn.Module):
    """UNet conditioned on a bilinear-upsampled low-res image
    (ref: guided_diffusion/unet.py:671-685 SuperResModel): the low-res
    conditioning concatenates onto the input channels."""
    unet: ADMUNet  # build with in_channels = 2 * image channels

    @nn.compact
    def __call__(self, x, timesteps, low_res=None, **kwargs):
        B, H, W, C = x.shape
        upsampled = jax.image.resize(low_res, (low_res.shape[0], H, W, C),
                                     "bilinear")
        return self.unet(jnp.concatenate([x, upsampled], axis=-1), timesteps,
                         **kwargs)


class ADMUNetV2(nn.Module):
    """ADM UNet + learned-covariance head for the DWT/DCT-Var models.

    Equivalent of the reference's OpenAIDenoiserV2 module state
    (ref: k_diffusion/external.py:135-169): the pretrained UNet plus a 1x1
    conv `out_cov` on the penultimate feature map emitting per-pixel
    (logvar, logvar_ot). Returns (eps, logvar, logvar_ot); callers apply
    EDM input/output scalings (see guidance.make_openai_v2_uncond).
    """
    unet: ADMUNet

    @nn.compact
    def __call__(self, x_scaled, t, deterministic: bool = True):
        out, feature = self.unet(x_scaled, t, return_feature=True,
                                 deterministic=deterministic)
        C = x_scaled.shape[-1]
        eps = out[..., :C]
        cov = nn.Conv(2 * C, (1, 1), dtype=self.unet.dtype,
                      param_dtype=jnp.float32, name="out_cov")(feature)
        logvar, logvar_ot = jnp.split(cov, 2, axis=-1)
        return eps, logvar, logvar_ot


def ffhq_unet(dtype=jnp.float32, dropout: float = 0.0, **kw) -> ADMUNet:
    """FFHQ-256 config (ref: configs/test_ffhq.json:13-17 +
    diffpir_utils/utils_model.py:353-381 defaults)."""
    return ADMUNet(image_size=256, model_channels=128, num_res_blocks=1,
                   attention_resolutions=(16,), channel_mult=(1, 1, 2, 2, 4, 4),
                   num_heads=4, num_head_channels=64, use_scale_shift_norm=True,
                   resblock_updown=True, out_channels=6, dropout=dropout,
                   dtype=dtype, **kw)


def imagenet_unet(dtype=jnp.float32, class_cond: bool = False,
                  dropout: float = 0.0, **kw) -> ADMUNet:
    """ImageNet-256 config (ref: configs/test_imagenet.json:8-12)."""
    return ADMUNet(image_size=256, model_channels=256, num_res_blocks=2,
                   attention_resolutions=(8, 16, 32), channel_mult=(1, 1, 2, 2, 4, 4),
                   num_heads=4, num_head_channels=64, use_scale_shift_norm=True,
                   resblock_updown=True, out_channels=6,
                   num_classes=1000 if class_cond else None,
                   dropout=dropout, dtype=dtype, **kw)


def create_unet(image_size: int = 256, num_channels: int = 128, num_res_blocks: int = 1,
                channel_mult: str = "", learn_sigma: bool = True, class_cond: bool = False,
                attention_resolutions: str = "16", num_heads: int = 4,
                num_head_channels: int = 64, num_heads_upsample: int = -1,
                use_scale_shift_norm: bool = True, dropout: float = 0.0,
                resblock_updown: bool = True, use_new_attention_order: bool = False,
                dtype=jnp.float32, **kw) -> ADMUNet:
    """Flag-compatible factory (ref: guided_diffusion/script_util.py:130-184)."""
    if channel_mult == "":
        channel_mult_t = {512: (0.5, 1, 1, 2, 2, 4, 4), 256: (1, 1, 2, 2, 4, 4),
                          128: (1, 1, 2, 3, 4), 64: (1, 2, 3, 4)}[image_size]
    else:
        channel_mult_t = tuple(int(m) for m in channel_mult.split(","))
    attention_ds = tuple(image_size // int(r) for r in attention_resolutions.split(","))
    return ADMUNet(image_size=image_size, in_channels=3, model_channels=num_channels,
                   out_channels=(6 if learn_sigma else 3), num_res_blocks=num_res_blocks,
                   attention_resolutions=attention_ds, dropout=dropout,
                   channel_mult=channel_mult_t,
                   num_classes=(1000 if class_cond else None), num_heads=num_heads,
                   num_head_channels=num_head_channels,
                   num_heads_upsample=num_heads_upsample,
                   use_scale_shift_norm=use_scale_shift_norm,
                   resblock_updown=resblock_updown,
                   use_new_attention_order=use_new_attention_order, dtype=dtype,
                   **kw)
