#!/usr/bin/env python
"""Generate key-layout manifests (name -> shape/dtype) for the published
weight files this framework converts but cannot download here (no egress):

  kdip_tpu/manifests/lpips_vgg16.json
      torchvision `vgg16` state dict (features.* convs + classifier head)
      and the lpips package's `weights/v0.1/vgg.pth` lin heads
      (ref consumer: sample_condition_openai.py:11,56).
  kdip_tpu/manifests/clean_fid_inception_v3.json
      pytorch-fid / clean-fid FID InceptionV3 weights
      (`pt_inception-2015-12-05-*.pth`, torchvision Inception3 naming;
      ref consumer: k_diffusion/evaluation.py:17-34).
  kdip_tpu/manifests/ffhq_dwt_ckpt.json
      the reference's released DWT-Var Lightning checkpoint
      (`ffhq_dwt.ckpt`, train_openai.py:81-88) — derived AUTHORITATIVELY by
      instantiating the reference's own torch model
      (OpenAIDenoiserV2(create_model_and_diffusion(...)) with
      configs/train_ffhq_dwt.json) and exporting its state-dict layout
      under the Lightning 'model.'/'model_ema.' prefixes.

Provenance: the lpips/inception layouts are generated from this repo's
torch mirrors (tests/test_lpips_backbone.py, tests/test_inception_backbone.py),
which were written to the public torchvision/pytorch-fid sources; the
ffhq_dwt layout is generated from the reference code itself. When a real
weight file is available, validate in one command each:

  python -m kdip_tpu.cli.convert_weights lpips \
      --src vgg16-397923af.pth --lin lpips/weights/v0.1/vgg.pth \
      --out lpips_vgg.npz
  python -m kdip_tpu.cli.convert_weights inception \
      --src pt_inception-2015-12-05-6726825d.pth --out inception.npz
  python -m kdip_tpu.cli.convert_weights v2 \
      --src ffhq_dwt.ckpt --out ffhq_dwt_params/

and check an incoming file against its manifest first with
  python scripts/make_weight_manifests.py --check <file> <manifest>
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

OUT_DIR = os.path.join(REPO, "kdip_tpu", "manifests")


def spec_of(sd):
    out = {}
    for k, v in sd.items():
        try:
            import torch
            if isinstance(v, torch.Tensor):
                out[k] = {"shape": list(v.shape),
                          "dtype": str(v.dtype).replace("torch.", "")}
                continue
        except ImportError:
            pass
        import numpy as np
        a = np.asarray(v)
        out[k] = {"shape": list(a.shape), "dtype": str(a.dtype)}
    return out


def lpips_manifest():
    from test_lpips_backbone import (LPIPS_PUBLISHED_LINS,
                                     VGG16_PUBLISHED_CONVS)
    vgg = {}
    for key, shape in VGG16_PUBLISHED_CONVS:
        vgg[f"{key}.weight"] = {"shape": list(shape), "dtype": "float32"}
        vgg[f"{key}.bias"] = {"shape": [shape[0]], "dtype": "float32"}
    # the published torchvision file also carries the classifier head,
    # which the converter must skip (vgg16 cfg D: 25088 -> 4096 -> 4096
    # -> 1000)
    for i, (o, i_) in zip((0, 3, 6), ((4096, 25088), (4096, 4096),
                                      (1000, 4096))):
        vgg[f"classifier.{i}.weight"] = {"shape": [o, i_],
                                         "dtype": "float32"}
        vgg[f"classifier.{i}.bias"] = {"shape": [o], "dtype": "float32"}
    lins = {k: {"shape": list(s), "dtype": "float32"}
            for k, s in LPIPS_PUBLISHED_LINS.items()}
    return {
        "_meta": {
            "file": "torchvision vgg16-397923af.pth + "
                    "lpips/weights/v0.1/vgg.pth",
            "consumer": "kdip_tpu.metrics.convert_lpips_weights "
                        "(cli: convert_weights lpips)",
            "provenance": "repo torch mirror of torchvision cfg-D VGG16 + "
                          "lpips lin heads (tests/test_lpips_backbone.py)",
        },
        "vgg16": vgg,
        "lpips_lins": lins,
    }


def inception_manifest():
    from test_inception_backbone import build_torch_inception
    trunk = build_torch_inception()
    entries = spec_of(trunk.state_dict())
    # the published FID file also carries the 1008-way TF-classifier head,
    # which the converter must skip (pool3 features are taken pre-fc)
    entries["fc.weight"] = {"shape": [1008, 2048], "dtype": "float32"}
    entries["fc.bias"] = {"shape": [1008], "dtype": "float32"}
    return {
        "_meta": {
            "file": "pt_inception-2015-12-05-6726825d.pth "
                    "(pytorch-fid / clean-fid FID InceptionV3)",
            "consumer": "kdip_tpu.models.inception."
                        "convert_inception_state_dict "
                        "(cli: convert_weights inception)",
            "provenance": "repo torch mirror in torchvision Inception3 "
                          "naming (tests/test_inception_backbone.py)",
        },
        "entries": entries,
    }


def ffhq_dwt_manifest():
    """Authoritative: built from the reference's own model code."""
    from conftest import _install_reference_shim
    _install_reference_shim()

    import torch
    from condition.diffpir_utils import utils_model
    from guided_diffusion.script_util import (args_to_dict,
                                              create_model_and_diffusion,
                                              model_and_diffusion_defaults)
    from k_diffusion.external import OpenAIDenoiserV2

    with open(os.path.join(REPO, "configs", "train_ffhq_dwt.json")) as f:
        config = json.load(f)
    args = utils_model.create_argparser(
        config["model"]["openai"]).parse_args([])
    with torch.no_grad():
        inner, diffusion = create_model_and_diffusion(
            **args_to_dict(args, model_and_diffusion_defaults().keys()))
        v2 = OpenAIDenoiserV2(inner, diffusion,
                              ortho_tf_type=config["model"]["ortho_tf_type"])
    one = spec_of(v2.state_dict())
    entries = {}
    for prefix in ("model.", "model_ema."):  # train_openai.py:86-87
        for k, v in one.items():
            entries[prefix + k] = v
    return {
        "_meta": {
            "file": "ffhq_dwt.ckpt (Lightning checkpoint; tensors live "
                    "under the top-level 'state_dict' key)",
            "consumer": "kdip_tpu.ckpt.convert_adm_state_dict + "
                        "convert_v2_out_cov (cli: convert_weights v2; "
                        "the model_ema.* prefix is preferred)",
            "provenance": "instantiated from the reference's own code: "
                          "OpenAIDenoiserV2(create_model_and_diffusion("
                          "configs/train_ffhq_dwt.json)) "
                          "(ref: train_openai.py:85-88,119-123)",
        },
        "entries": entries,
    }


def write(name, data):
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, name)
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
        f.write("\n")
    n = sum(len(v) for k, v in data.items() if k != "_meta")
    print(f"wrote {path} ({n} entries)")


def check(weight_file, manifest_path):
    """Compare a real weight file against a manifest before conversion."""
    from kdip_tpu import ckpt as kckpt
    sd = kckpt.load_torch_checkpoint(weight_file)
    with open(manifest_path) as f:
        manifest = json.load(f)
    want = manifest.get("entries") or manifest.get("vgg16")
    got = spec_of(sd)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    bad = [k for k in set(want) & set(got)
           if want[k]["shape"] != got[k]["shape"]]
    for label, items in (("missing", missing), ("unexpected", extra),
                         ("shape-mismatch", bad)):
        for k in items[:20]:
            print(f"{label}: {k}")
    ok = not (missing or bad)
    print("MATCH" if ok else "MISMATCH")
    return 0 if ok else 1


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--check", nargs=2, metavar=("WEIGHTS", "MANIFEST"),
                   default=None)
    args = p.parse_args()
    if args.check:
        return check(*args.check)
    write("lpips_vgg16.json", lpips_manifest())
    write("clean_fid_inception_v3.json", inception_manifest())
    if os.path.isdir("/root/reference"):
        write("ffhq_dwt_ckpt.json", ffhq_dwt_manifest())
    else:
        print("reference repo absent: skipping ffhq_dwt_ckpt.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
