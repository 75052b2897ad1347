"""InceptionV3 FID backbone validation (VERDICT r1 weak #6): the flax trunk
+ state-dict converter vs an independently written torch mirror of the
pytorch-fid/clean-fid InceptionV3 variant (BN eps 1e-3, avg pools with
count_include_pad=False, Mixed_7c max-pool branch), with random weights
exported in the torchvision naming `convert_inception_state_dict` consumes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from kdip_tpu.models import inception as jinc


def build_torch_inception(seed=0):
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)

    class BasicConv2d(nn.Module):
        def __init__(self, in_ch, out_ch, **kw):
            super().__init__()
            self.conv = nn.Conv2d(in_ch, out_ch, bias=False, **kw)
            self.bn = nn.BatchNorm2d(out_ch, eps=1e-3)
            # randomize BN stats so conversion of running stats is exercised
            with torch.no_grad():
                self.bn.running_mean.normal_(0, 0.1)
                self.bn.running_var.uniform_(0.5, 1.5)
                self.bn.weight.uniform_(0.5, 1.5)
                self.bn.bias.normal_(0, 0.1)

        def forward(self, x):
            return torch.relu(self.bn(self.conv(x)))

    def avgp(x):
        return nn.functional.avg_pool2d(x, 3, 1, 1,
                                        count_include_pad=False)

    class InceptionA(nn.Module):
        def __init__(self, in_ch, pool_features):
            super().__init__()
            self.branch1x1 = BasicConv2d(in_ch, 64, kernel_size=1)
            self.branch5x5_1 = BasicConv2d(in_ch, 48, kernel_size=1)
            self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = BasicConv2d(in_ch, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
            self.branch_pool = BasicConv2d(in_ch, pool_features, kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b5 = self.branch5x5_2(self.branch5x5_1(x))
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            bp = self.branch_pool(avgp(x))
            return torch.cat([b1, b5, bd, bp], 1)

    class InceptionB(nn.Module):
        def __init__(self, in_ch):
            super().__init__()
            self.branch3x3 = BasicConv2d(in_ch, 384, kernel_size=3, stride=2)
            self.branch3x3dbl_1 = BasicConv2d(in_ch, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

        def forward(self, x):
            b3 = self.branch3x3(x)
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            bp = nn.functional.max_pool2d(x, 3, 2)
            return torch.cat([b3, bd, bp], 1)

    class InceptionC(nn.Module):
        def __init__(self, in_ch, c7):
            super().__init__()
            self.branch1x1 = BasicConv2d(in_ch, 192, kernel_size=1)
            self.branch7x7_1 = BasicConv2d(in_ch, c7, kernel_size=1)
            self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                           padding=(0, 3))
            self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                           padding=(3, 0))
            self.branch7x7dbl_1 = BasicConv2d(in_ch, c7, kernel_size=1)
            self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                              padding=(3, 0))
            self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                              padding=(0, 3))
            self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                              padding=(3, 0))
            self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                              padding=(0, 3))
            self.branch_pool = BasicConv2d(in_ch, 192, kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
                self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
            bp = self.branch_pool(avgp(x))
            return torch.cat([b1, b7, bd, bp], 1)

    class InceptionD(nn.Module):
        def __init__(self, in_ch):
            super().__init__()
            self.branch3x3_1 = BasicConv2d(in_ch, 192, kernel_size=1)
            self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
            self.branch7x7x3_1 = BasicConv2d(in_ch, 192, kernel_size=1)
            self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                             padding=(0, 3))
            self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                             padding=(3, 0))
            self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

        def forward(self, x):
            b3 = self.branch3x3_2(self.branch3x3_1(x))
            b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x))))
            bp = nn.functional.max_pool2d(x, 3, 2)
            return torch.cat([b3, b7, bp], 1)

    class InceptionE(nn.Module):
        def __init__(self, in_ch, pool="avg"):
            super().__init__()
            self.pool = pool
            self.branch1x1 = BasicConv2d(in_ch, 320, kernel_size=1)
            self.branch3x3_1 = BasicConv2d(in_ch, 384, kernel_size=1)
            self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                            padding=(0, 1))
            self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                            padding=(1, 0))
            self.branch3x3dbl_1 = BasicConv2d(in_ch, 448, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3,
                                              padding=1)
            self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                               padding=(0, 1))
            self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                               padding=(1, 0))
            self.branch_pool = BasicConv2d(in_ch, 192, kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd),
                            self.branch3x3dbl_3b(bd)], 1)
            if self.pool == "avg":
                bp = avgp(x)
            else:
                bp = nn.functional.max_pool2d(x, 3, 1, 1)
            bp = self.branch_pool(bp)
            return torch.cat([b1, b3, bd, bp], 1)

    class Trunk(nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
            self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
            self.Mixed_5b = InceptionA(192, 32)
            self.Mixed_5c = InceptionA(256, 64)
            self.Mixed_5d = InceptionA(288, 64)
            self.Mixed_6a = InceptionB(288)
            self.Mixed_6b = InceptionC(768, 128)
            self.Mixed_6c = InceptionC(768, 160)
            self.Mixed_6d = InceptionC(768, 160)
            self.Mixed_6e = InceptionC(768, 192)
            self.Mixed_7a = InceptionD(768)
            self.Mixed_7b = InceptionE(1280, "avg")
            self.Mixed_7c = InceptionE(2048, "max")

        def forward(self, x):
            x = self.Conv2d_1a_3x3(x)
            x = self.Conv2d_2a_3x3(x)
            x = self.Conv2d_2b_3x3(x)
            x = nn.functional.max_pool2d(x, 3, 2)
            x = self.Conv2d_3b_1x1(x)
            x = self.Conv2d_4a_3x3(x)
            x = nn.functional.max_pool2d(x, 3, 2)
            for m in [self.Mixed_5b, self.Mixed_5c, self.Mixed_5d,
                      self.Mixed_6a, self.Mixed_6b, self.Mixed_6c,
                      self.Mixed_6d, self.Mixed_6e, self.Mixed_7a,
                      self.Mixed_7b, self.Mixed_7c]:
                x = m(x)
            return x.mean(dim=(2, 3))

    return Trunk().eval()


@pytest.mark.slow
def test_inception_features_match_torch_mirror():
    import torch

    trunk = build_torch_inception()
    variables = jinc.convert_inception_state_dict(trunk.state_dict())
    model = jinc.InceptionV3Features()

    rng = np.random.RandomState(0)
    x = (rng.rand(1, 3, 299, 299).astype(np.float32) * 2 - 1)
    with torch.no_grad():
        ref = trunk(torch.tensor(x)).numpy()
    ours = np.asarray(model.apply(variables,
                                  jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert ours.shape == ref.shape == (1, 2048)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)


def test_inception_converter_tree_matches_model_init_exactly():
    """Converter <-> flax-init structural round-trip (VERDICT r2 next #4b):
    the converted tree must have EXACTLY the leaf paths and shapes that
    InceptionV3Features.init produces — a converted real checkpoint with a
    missing/mis-routed tensor would silently fall back to random init
    under flax's param merging, so structural equality is the guard."""
    import jax
    import jax.numpy as jnp

    trunk = build_torch_inception()
    converted = jinc.convert_inception_state_dict(trunk.state_dict())
    model = jinc.InceptionV3Features()
    want = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))

    def leaf_paths(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(leaf_paths(v, prefix + (k,)))
            else:
                out[prefix + (k,)] = np.asarray(v).shape
        return out

    for col in ("params", "batch_stats"):
        got = leaf_paths(converted[col])
        exp = leaf_paths(jax.tree.map(np.asarray, dict(want[col])))
        missing = set(exp) - set(got)
        extra = set(got) - set(exp)
        assert not missing, f"{col}: converter missed {sorted(missing)[:5]}"
        assert not extra, f"{col}: converter invented {sorted(extra)[:5]}"
        for path in exp:
            assert got[path] == exp[path], (path, got[path], exp[path])
