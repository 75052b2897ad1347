"""Real-weight readiness (VERDICT r3 #7): the shipped key-layout manifests
(kdip_tpu/manifests/*.json) describe the published weight files exactly, and
each converter round-trips a synthesized state dict of that exact layout
into parameters the corresponding Flax model accepts — so when a real file
arrives, validation is one documented command
(scripts/make_weight_manifests.py --check, then cli/convert_weights)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAN = os.path.join(REPO, "kdip_tpu", "manifests")


def load(name):
    with open(os.path.join(MAN, name)) as f:
        return json.load(f)


def synth(entries, seed=0):
    rng = np.random.RandomState(seed)
    return {k: np.asarray(rng.randn(*v["shape"]) * 0.05).astype(v["dtype"])
            for k, v in entries.items()}


def shapes(tree):
    return jax.tree.map(lambda x: tuple(x.shape), tree)


def test_manifests_in_sync_with_generators():
    """The checked-in JSONs regenerate bit-identically (the ffhq one needs
    the reference repo, present in CI here)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import make_weight_manifests as m
    assert load("lpips_vgg16.json") == json.loads(
        json.dumps(m.lpips_manifest()))
    assert load("clean_fid_inception_v3.json") == json.loads(
        json.dumps(m.inception_manifest()))
    if os.path.isdir("/root/reference"):
        assert load("ffhq_dwt_ckpt.json") == json.loads(
            json.dumps(m.ffhq_dwt_manifest()))


def test_lpips_manifest_roundtrip():
    from kdip_tpu import metrics
    man = load("lpips_vgg16.json")
    vgg_sd = synth(man["vgg16"])
    lin_sd = {k: np.abs(v) for k, v in synth(man["lpips_lins"]).items()}
    params = metrics.convert_lpips_weights(vgg_sd, lin_sd)
    a = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3), jnp.float32)
    d = metrics.lpips_vgg(params, a, a * 0.5)
    assert np.isfinite(np.asarray(d)).all()


def test_inception_manifest_roundtrip():
    from kdip_tpu.models.inception import (convert_inception_state_dict,
                                           make_inception_extractor)
    man = load("clean_fid_inception_v3.json")
    sd = synth(man["entries"])
    # BN running_var must be positive
    for k in sd:
        if k.endswith("running_var"):
            sd[k] = np.abs(sd[k]) + 0.5
    extractor = make_inception_extractor(convert_inception_state_dict(sd))
    feats = extractor(jnp.zeros((2, 64, 64, 3)))
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()


@pytest.mark.slow
def test_ffhq_dwt_manifest_roundtrip(tmp_path):
    """Synthesizes a Lightning ffhq_dwt.ckpt AT THE MANIFEST'S EXACT LAYOUT,
    drives the real `convert_weights v2` CLI on it, and asserts the
    converted tree matches the flax ADMUNetV2 init shape-for-shape."""
    import torch

    from kdip_tpu import ckpt
    from kdip_tpu.models import adm

    man = load("ffhq_dwt_ckpt.json")
    sd = {k: torch.from_numpy(v) for k, v in synth(man["entries"]).items()}
    src = tmp_path / "ffhq_dwt.ckpt"
    torch.save({"state_dict": sd, "epoch": 0}, src)

    out = tmp_path / "params"
    from kdip_tpu.cli import convert_weights
    convert_weights.main(["v2", "--src", str(src), "--out", str(out)])

    params = ckpt.load_checkpoint(str(out))
    model = adm.ADMUNetV2(unet=adm.ffhq_unet())
    want = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)),
                           jnp.zeros((1,))))["params"]
    assert shapes(params) == shapes(want)
    # and the converted values are the (model_ema.) source tensors, mapped
    w = np.asarray(params["out_cov"]["kernel"])
    src_w = sd["model_ema.out_cov.weight"].numpy()
    np.testing.assert_array_equal(w, src_w.transpose(2, 3, 1, 0))


def test_manifest_check_command(tmp_path):
    """`make_weight_manifests.py --check` verdicts a candidate file."""
    import torch
    man = load("lpips_vgg16.json")
    sd = {k: torch.from_numpy(v) for k, v in synth(man["vgg16"]).items()}
    good = tmp_path / "vgg.pth"
    torch.save(sd, good)
    script = os.path.join(REPO, "scripts", "make_weight_manifests.py")
    r = subprocess.run([sys.executable, script, "--check", str(good),
                        os.path.join(MAN, "lpips_vgg16.json")],
                       capture_output=True, text=True)
    assert r.returncode == 0 and "MATCH" in r.stdout, r.stdout + r.stderr

    sd["features.0.weight"] = torch.zeros(7, 3, 3, 3)  # wrong shape
    bad = tmp_path / "vgg_bad.pth"
    torch.save(sd, bad)
    r = subprocess.run([sys.executable, script, "--check", str(bad),
                        os.path.join(MAN, "lpips_vgg16.json")],
                       capture_output=True, text=True)
    assert r.returncode == 1 and "MISMATCH" in r.stdout
