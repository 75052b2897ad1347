"""InceptionV3 feature extractor for FID (Flax, NHWC).

Equivalent of the backbone behind the reference's InceptionV3FeatureExtractor
(k_diffusion/evaluation.py:17-33, via the clean-fid wheel): the torchvision
InceptionV3 trunk up to the 2048-dim average pool, with the FID-specific
tweaks (average pools exclude padding; Mixed_7c's pool branch uses max
pooling). Weights convert from the standard `pt_inception`/torchvision state
dict via `convert_inception_state_dict` (no network egress here, so weights
are supplied by the user).

Inputs: [B, H, W, 3] in [-1, 1]; resized to 299x299 bilinear (matching
pytorch-fid's resize_input). Output: [B, 2048] pooled features.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Any = 0

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(self.out_channels, tuple(self.kernel),
                    strides=tuple(self.strides), padding=pad, use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn")(x)
        return nn.relu(x)


def _avg_pool_nocount(x, window=3, stride=1, pad=1):
    """3x3 avg pool, count_include_pad=False (the FID fix)."""
    ones = jnp.ones_like(x[..., :1])
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                   (1, window, window, 1),
                                   (1, stride, stride, 1),
                                   [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add,
                                   (1, window, window, 1),
                                   (1, stride, stride, 1),
                                   [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    return summed / counts


def _max_pool(x, window=3, stride=2, pad=0):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, window, window, 1),
                                 (1, stride, stride, 1),
                                 [(0, 0), (pad, pad), (pad, pad), (0, 0)])


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_nocount(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_nocount(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_type: str = "avg"  # FID: Mixed_7b avg, Mixed_7c max

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_type == "avg":
            bp = _avg_pool_nocount(x)
        else:
            bp = _max_pool(x, window=3, stride=1, pad=1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Trunk to the 2048-dim pooled features (FID backbone)."""

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, 3] in [-1, 1]; pt_inception expects this scaling
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # [B, 2048]


def convert_inception_state_dict(state_dict) -> Dict:
    """torchvision/pt_inception state dict -> flax params + batch_stats.

    Keys look like `Mixed_5b.branch1x1.conv.weight`, `...bn.weight`,
    `...bn.running_mean`. Returns {'params': ..., 'batch_stats': ...}.
    """
    params: Dict = {}
    batch_stats: Dict = {}

    def as_np(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return np.asarray(t, np.float32)

    def setp(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val

    for key, tensor in state_dict.items():
        if key.startswith("fc.") or key.startswith("AuxLogits"):
            continue
        parts = key.split(".")
        w = as_np(tensor)
        module_path = parts[:-2]
        leaf_mod, pname = parts[-2], parts[-1]
        if leaf_mod == "conv":
            assert pname == "weight"
            setp(params, tuple(module_path) + ("conv", "kernel"),
                 w.transpose(2, 3, 1, 0))
        elif leaf_mod == "bn":
            if pname == "weight":
                setp(params, tuple(module_path) + ("bn", "scale"), w)
            elif pname == "bias":
                setp(params, tuple(module_path) + ("bn", "bias"), w)
            elif pname == "running_mean":
                setp(batch_stats, tuple(module_path) + ("bn", "mean"), w)
            elif pname == "running_var":
                setp(batch_stats, tuple(module_path) + ("bn", "var"), w)
            elif pname == "num_batches_tracked":
                pass
            else:
                raise KeyError(key)
        else:
            raise KeyError(key)
    return {"params": params, "batch_stats": batch_stats}


def make_inception_extractor(weights):
    """Builds the FID feature extractor. `weights` is either a converted
    variables dict or a torch state dict."""
    model = InceptionV3Features()
    if "params" not in weights:
        weights = convert_inception_state_dict(weights)

    @jax.jit
    def extract(batch):
        return model.apply(weights, batch)

    return extract
