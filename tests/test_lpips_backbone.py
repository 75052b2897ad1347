"""LPIPS-VGG backbone validation (VERDICT r1 weak #6): the flax compute graph
+ weight converter vs an independently written torch mirror of the lpips
package's pipeline (scaling layer -> VGG16 feature taps -> channel-unit
normalization -> nonneg 1x1 lin heads -> spatial mean -> layer sum).

The real lpips package / torchvision are absent from this environment, so
the torch side is reconstructed here from the published LPIPS definition
(Zhang et al. 2018; lpips/lpips.py in the pip package) with random weights,
exported in the torchvision/lpips state-dict naming that
`convert_lpips_weights` consumes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from kdip_tpu import metrics

VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
TAP_CONVS = [1, 3, 6, 9, 12]


def build_torch_mirror(seed=0):
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    layers = []
    in_ch = 3
    for c in VGG_CFG:
        if c == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, c, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_ch = c
    features = nn.Sequential(*layers)
    lins = [nn.Conv2d(ch, 1, 1, bias=False)
            for ch in (64, 128, 256, 512, 512)]
    for lin in lins:
        with torch.no_grad():
            lin.weight.abs_()  # lpips constrains lin weights nonnegative

    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)

    def forward(a, b):
        """a, b: [B, 3, H, W] in [-1, 1] (the lpips package convention)."""
        def feats(x):
            x = (x - shift) / scale
            out = []
            conv_i = 0
            h = x
            for m in features:
                h = m(h)
                if isinstance(m, nn.ReLU):
                    if conv_i in TAP_CONVS:
                        out.append(h)
                    conv_i += 1
            return out

        fa, fb = feats(a), feats(b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / (xa.pow(2).sum(dim=1, keepdim=True) + 1e-10).sqrt()
            nb = xb / (xb.pow(2).sum(dim=1, keepdim=True) + 1e-10).sqrt()
            d = lins[i]((na - nb) ** 2)
            total = total + d.mean(dim=(2, 3)).squeeze(1)
        return total

    # export in the naming convert_lpips_weights expects
    vgg_sd = {}
    li = 0
    for m in features:
        import torch.nn as nn2
        if isinstance(m, nn2.Conv2d):
            vgg_sd[f"features.{li}.weight"] = m.weight.detach()
            vgg_sd[f"features.{li}.bias"] = m.bias.detach()
        li += 1
    lpips_sd = {f"lin{i}.model.1.weight": lins[i].weight.detach()
                for i in range(5)}
    return forward, vgg_sd, lpips_sd


def test_lpips_vgg_matches_torch_mirror():
    import torch

    forward, vgg_sd, lpips_sd = build_torch_mirror()
    params = metrics.convert_lpips_weights(vgg_sd, lpips_sd)

    rng = np.random.RandomState(0)
    a01 = rng.rand(2, 3, 32, 32).astype(np.float32)
    b01 = rng.rand(2, 3, 32, 32).astype(np.float32)

    with torch.no_grad():
        ref = forward(torch.tensor(a01 * 2 - 1),
                      torch.tensor(b01 * 2 - 1)).numpy()
    ours = np.asarray(metrics.lpips_vgg(
        params, jnp.asarray(a01.transpose(0, 2, 3, 1)),
        jnp.asarray(b01.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_lpips_zero_for_identical_inputs():
    _, vgg_sd, lpips_sd = build_torch_mirror(seed=1)
    params = metrics.convert_lpips_weights(vgg_sd, lpips_sd)
    # >= 32 px: VGG16's four inter-tap pools need 2^4 spatial extent
    x = np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32)
    d = float(metrics.lpips_vgg(params, jnp.asarray(x), jnp.asarray(x))[0])
    assert abs(d) < 1e-8


# ---------------------------------------------------------------------------
# Published state-dict layout round-trip (VERDICT r2 next #4b)
# ---------------------------------------------------------------------------

# The exact (key, shape) inventory of the conv weights in torchvision's
# published vgg16 checkpoint (features.* Sequential indices: convs at
# 0,2,5,7,10,12,14,17,19,21,24,26,28 with MaxPools at 4,9,16,23,30 —
# torchvision/models/vgg.py cfg "D") and of the lpips package's vgg.pth
# lin heads (lpips/lpips.py: lin{i}.model = [Dropout, Conv2d(C,1,1,bias=False)]).
# Written down as literals so the converter is tested against the REAL
# published layout, not against whatever the torch mirror above happens to
# produce.
VGG16_PUBLISHED_CONVS = [
    ("features.0", (64, 3, 3, 3)), ("features.2", (64, 64, 3, 3)),
    ("features.5", (128, 64, 3, 3)), ("features.7", (128, 128, 3, 3)),
    ("features.10", (256, 128, 3, 3)), ("features.12", (256, 256, 3, 3)),
    ("features.14", (256, 256, 3, 3)), ("features.17", (512, 256, 3, 3)),
    ("features.19", (512, 512, 3, 3)), ("features.21", (512, 512, 3, 3)),
    ("features.24", (512, 512, 3, 3)), ("features.26", (512, 512, 3, 3)),
    ("features.28", (512, 512, 3, 3)),
]
LPIPS_PUBLISHED_LINS = {
    f"lin{i}.model.1.weight": (1, c, 1, 1)
    for i, c in enumerate([64, 128, 256, 512, 512])
}


def test_lpips_converter_consumes_published_checkpoint_layout():
    """Synthesizes state dicts with the published checkpoints' exact keys
    and shapes (incl. the classifier.* keys the converter must ignore) and
    round-trips them through convert_lpips_weights + lpips_vgg."""
    rng = np.random.RandomState(0)
    vgg_sd = {}
    for key, shape in VGG16_PUBLISHED_CONVS:
        vgg_sd[f"{key}.weight"] = rng.randn(*shape).astype(np.float32) * 0.05
        vgg_sd[f"{key}.bias"] = rng.randn(shape[0]).astype(np.float32) * 0.05
    # the real torchvision file also carries the classifier head
    vgg_sd["classifier.0.weight"] = rng.randn(4096, 25088).astype(np.float32)
    vgg_sd["classifier.0.bias"] = rng.randn(4096).astype(np.float32)
    lpips_sd = {k: np.abs(rng.randn(*s)).astype(np.float32)
                for k, s in LPIPS_PUBLISHED_LINS.items()}

    params = metrics.convert_lpips_weights(vgg_sd, lpips_sd)

    # every conv mapped, HWIO-transposed, in published order
    assert sorted(k for k in params if k.startswith("conv")) == sorted(
        f"conv{i}" for i in range(13))
    for i, (key, shape) in enumerate(VGG16_PUBLISHED_CONVS):
        o, ich, kh, kw = shape
        assert params[f"conv{i}"]["kernel"].shape == (kh, kw, ich, o)
        np.testing.assert_array_equal(
            params[f"conv{i}"]["kernel"],
            vgg_sd[f"{key}.weight"].transpose(2, 3, 1, 0))
    for i, c in enumerate([64, 128, 256, 512, 512]):
        assert params[f"lin{i}"]["kernel"].shape == (c,)

    # the converted tree drives the flax graph end-to-end
    a = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    d = metrics.lpips_vgg(params, a, b)
    assert np.isfinite(np.asarray(d)).all() and float(d[0]) > 0
    np.testing.assert_allclose(np.asarray(metrics.lpips_vgg(params, a, a)),
                               0.0, atol=1e-6)
