#!/usr/bin/env python
"""ONE command to validate every published artifact this framework converts,
the day real weight files become available (VERDICT r4 #8).

    python scripts/validate_real_artifacts.py --dir /path/to/files

scans --dir for the published file names the reference README distributes
(README.md:36-45) and, for every file found, runs the full pipeline:

  1. key-layout manifest check (kdip_tpu/manifests/*.json) — the file's
     state-dict names/shapes/dtypes must match the published layout;
  2. conversion through the real CLI (kdip_tpu.cli.convert_weights);
  3. a load-and-forward smoke: the converted parameters must be accepted
     by the consuming Flax model and produce finite outputs.

Also runs the PyWavelets layout validation (scripts/validate_pywt_layout.py)
when pywt is importable — the one oracle that needs a pip install rather
than a weight file.

Recognized file names (any subset may be present; the rest are SKIPPED):
  diffusion_ffhq_10m.pt            ADM FFHQ-256 checkpoint
  256x256_diffusion_uncond.pt      ADM ImageNet-256 checkpoint
  ffhq_dwt.ckpt                    DWT-Var Lightning checkpoint
  recon_mse.pt                     analytic-variance table
  vgg16-397923af.pth               torchvision VGG16 (LPIPS backbone)
  lpips_vgg.pth / vgg.pth          lpips package lin heads (v0.1)
  pt_inception-2015-12-05-6726825d.pth  clean-fid InceptionV3

Exit 0 = nothing failed (skips are fine); 1 = at least one FAIL.
Each artifact prints one PASS/SKIP/FAIL line; the summary repeats them.
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MAN = os.path.join(REPO, "kdip_tpu", "manifests")

RESULTS = []


def record(name, status, detail=""):
    RESULTS.append((name, status, detail))
    print(f"[{status}] {name}" + (f": {detail}" if detail else ""), flush=True)


def manifest_check(weights_path, manifest_name, section=None):
    """Layout check via make_weight_manifests.check's spec logic."""
    import make_weight_manifests as m
    with open(os.path.join(MAN, manifest_name)) as f:
        manifest = json.load(f)
    if section is not None:
        manifest = manifest[section]
    from kdip_tpu import ckpt
    sd = ckpt.load_torch_checkpoint(weights_path)
    spec = m.spec_of(sd)
    missing = sorted(set(manifest) - set(spec))
    extra = sorted(set(spec) - set(manifest))
    wrong = sorted(k for k in set(manifest) & set(spec)
                   if manifest[k] != spec[k])
    if missing or extra or wrong:
        raise AssertionError(
            f"layout mismatch vs {manifest_name}: missing={missing[:5]} "
            f"extra={extra[:5]} wrong={wrong[:5]}")


def _convert(argv):
    from kdip_tpu.cli import convert_weights
    convert_weights.main(argv)


def validate_adm(path, out_dir):
    import jax
    import jax.numpy as jnp
    from kdip_tpu import ckpt
    from kdip_tpu.models import adm
    out = os.path.join(out_dir, "adm_params")
    _convert(["adm", "--src", path, "--out", out])
    params = ckpt.load_checkpoint(out)
    model = adm.ffhq_unet()
    ref = model.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)),
                     jnp.zeros((1,)))["params"]
    same = (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(ref))
    assert same, "converted param tree does not match adm.ffhq_unet()"
    y = model.apply({"params": params}, jnp.zeros((1, 256, 256, 3)),
                    jnp.zeros((1,)))
    assert bool(jnp.isfinite(y).all()), "non-finite UNet output"


def validate_v2(path, out_dir):
    import jax
    import jax.numpy as jnp
    manifest_check(path, "ffhq_dwt_ckpt.json", section="entries")
    from kdip_tpu import ckpt
    from kdip_tpu.models import adm
    out = os.path.join(out_dir, "v2_params")
    _convert(["v2", "--src", path, "--out", out])
    params = ckpt.load_checkpoint(out)
    assert set(params) == {"unet", "out_cov"}
    model = adm.ADMUNetV2(unet=adm.ffhq_unet())
    want = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)),
                           jnp.zeros((1,))))["params"]
    shp = lambda t: jax.tree.map(lambda x: tuple(x.shape), t)
    assert shp(params) == shp(want), \
        "converted V2 param tree does not match ADMUNetV2(ffhq_unet())"


def validate_recon_mse(path, out_dir):
    out = os.path.join(out_dir, "recon_mse.npz")
    _convert(["recon_mse", "--src", path, "--out", out])
    data = np.load(out)
    assert "sigmas" in data and "mse_list" in data
    assert np.isfinite(data["sigmas"]).all()
    assert np.isfinite(data["mse_list"]).all()


def validate_lpips(vgg_path, lin_path, out_dir):
    import jax.numpy as jnp
    manifest_check(vgg_path, "lpips_vgg16.json", section="vgg16")
    manifest_check(lin_path, "lpips_vgg16.json", section="lpips_lins")
    from kdip_tpu import metrics
    out = os.path.join(out_dir, "lpips_vgg.npz")
    _convert(["lpips", "--src", vgg_path, "--lin", lin_path, "--out", out])
    lp = np.load(out, allow_pickle=True)
    params = {}
    for k in lp.files:
        mod, name = k.split(".", 1)
        params.setdefault(mod, {})[name] = jnp.asarray(lp[k])
    a = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    # lpips_vgg returns a per-image vector [B]
    d_same = float(jnp.mean(metrics.lpips_vgg(params, a, a)))
    d_diff = float(jnp.mean(metrics.lpips_vgg(params, a, a * -1 + 1)))
    assert np.isfinite(d_same) and np.isfinite(d_diff)
    assert d_same <= d_diff + 1e-6, "identical images scored farther apart"


def validate_inception(path, out_dir):
    import jax.numpy as jnp
    manifest_check(path, "clean_fid_inception_v3.json", section="entries")
    from kdip_tpu import ckpt
    from kdip_tpu.models import inception
    out = os.path.join(out_dir, "inception_params")
    _convert(["inception", "--src", path, "--out", out])
    variables = ckpt.load_checkpoint(out)
    extract = inception.make_inception_extractor(variables)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 299, 299, 3),
                    jnp.float32)
    feats = extract(x)
    assert feats.shape[-1] == 2048
    assert bool(jnp.isfinite(np.asarray(feats)).all())


def validate_pywt():
    try:
        import pywt  # noqa: F401
    except ImportError:
        record("pywt-layout", "SKIP", "PyWavelets not installed "
               "(pip install PyWavelets to close this oracle)")
        return
    import validate_pywt_layout
    rc = validate_pywt_layout.main()
    assert rc == 0, f"validate_pywt_layout exited {rc}"


def main(argv=None):
    p = argparse.ArgumentParser(
        description="validate real published artifacts in one command")
    p.add_argument("--dir", required=True,
                   help="directory containing the downloaded weight files")
    p.add_argument("--out", default=None,
                   help="where converted params go (default: <dir>/converted)")
    args = p.parse_args(argv)
    out_dir = args.out or os.path.join(args.dir, "converted")
    os.makedirs(out_dir, exist_ok=True)

    def find(*names):
        for n in names:
            path = os.path.join(args.dir, n)
            if os.path.exists(path):
                return path
        return None

    def run(name, fn, *paths):
        if any(p is None for p in paths):
            record(name, "SKIP", "file not present")
            return
        try:
            fn(*paths, out_dir)
            record(name, "PASS")
        except Exception as e:  # keep going; report at the end
            record(name, "FAIL", f"{type(e).__name__}: {e}")

    run("adm-ffhq", validate_adm, find("diffusion_ffhq_10m.pt"))
    run("adm-imagenet", validate_adm, find("256x256_diffusion_uncond.pt"))
    run("v2-ffhq-dwt", validate_v2, find("ffhq_dwt.ckpt"))
    run("recon-mse", validate_recon_mse, find("recon_mse.pt"))
    run("lpips-vgg", validate_lpips, find("vgg16-397923af.pth"),
        find("lpips_vgg.pth", "vgg.pth"))
    run("fid-inception", validate_inception,
        find("pt_inception-2015-12-05-6726825d.pth"))
    try:
        validate_pywt()
        if RESULTS[-1][0] != "pywt-layout":
            record("pywt-layout", "PASS")
    except Exception as e:
        record("pywt-layout", "FAIL", f"{type(e).__name__}: {e}")

    print("\n==== summary ====")
    for name, status, detail in RESULTS:
        print(f"  {status:4s}  {name}" + (f"  ({detail})" if detail else ""))
    n_fail = sum(1 for _, s, _ in RESULTS if s == "FAIL")
    n_pass = sum(1 for _, s, _ in RESULTS if s == "PASS")
    print(f"{n_pass} passed, {n_fail} failed, "
          f"{len(RESULTS) - n_pass - n_fail} skipped")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
