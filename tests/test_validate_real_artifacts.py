"""The one-command real-artifact playbook (VERDICT r4 #8).

`scripts/validate_real_artifacts.py --dir X` must run manifest-check →
convert → load-and-forward for every published weight file present in X.
Exercised here with stand-ins synthesized at the manifests' exact layouts,
so the command is proven runnable end-to-end before any real file exists.
"""

import importlib.util
import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAN = os.path.join(REPO, "kdip_tpu", "manifests")


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "validate_real_artifacts",
        os.path.join(REPO, "scripts", "validate_real_artifacts.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _synth(entries, seed=0):
    """Random tensors at the manifest's exact layout. BatchNorm running_var
    (and the lpips lin weights) must be nonnegative to survive a forward."""
    import torch
    rng = np.random.RandomState(seed)
    out = {}
    for k, v in entries.items():
        if v["dtype"] == "int64":
            out[k] = torch.zeros(v["shape"], dtype=torch.int64)
            continue
        arr = (rng.randn(*v["shape"]) * 0.05).astype(v["dtype"])
        if "running_var" in k or k.startswith("lin"):
            arr = np.abs(arr) + 1e-3
        out[k] = torch.from_numpy(arr)
    return out


@pytest.fixture(scope="module")
def standin_dir(tmp_path_factory):
    import torch
    d = tmp_path_factory.mktemp("real_artifacts")
    man = json.load(open(os.path.join(MAN, "lpips_vgg16.json")))
    torch.save(_synth(man["vgg16"]), d / "vgg16-397923af.pth")
    torch.save(_synth(man["lpips_lins"]), d / "lpips_vgg.pth")
    man = json.load(open(os.path.join(MAN, "clean_fid_inception_v3.json")))
    torch.save(_synth(man["entries"]),
               d / "pt_inception-2015-12-05-6726825d.pth")
    man = json.load(open(os.path.join(MAN, "ffhq_dwt_ckpt.json")))
    torch.save({"state_dict": _synth(man["entries"]), "epoch": 0},
               d / "ffhq_dwt.ckpt")
    torch.save({"sigmas": torch.linspace(0.01, 80, 10),
                "mse_list": torch.rand(10)}, d / "recon_mse.pt")
    return str(d)


@pytest.mark.slow
def test_one_command_validates_all_standins(standin_dir, capsys):
    vra = _load_script()
    rc = vra.main(["--dir", standin_dir])
    out = capsys.readouterr().out
    assert rc == 0, out
    for name in ("v2-ffhq-dwt", "recon-mse", "lpips-vgg", "fid-inception"):
        assert f"[PASS] {name}" in out, out
    # absent files are skipped, not failed
    assert "[SKIP] adm-ffhq" in out


@pytest.mark.slow
def test_layout_mismatch_is_a_fail(standin_dir, tmp_path, capsys):
    """A file that does NOT match its manifest must FAIL the run."""
    import torch
    d = tmp_path / "bad"
    d.mkdir()
    torch.save({"not.a.real.key": torch.zeros(3)}, d / "recon_mse.pt")
    man = json.load(open(os.path.join(MAN, "lpips_vgg16.json")))
    bad_vgg = _synth(man["vgg16"])
    bad_vgg.pop(sorted(bad_vgg)[0])  # drop a key -> layout mismatch
    torch.save(bad_vgg, d / "vgg16-397923af.pth")
    torch.save(_synth(man["lpips_lins"]), d / "lpips_vgg.pth")
    vra = _load_script()
    rc = vra.main(["--dir", str(d)])
    out = capsys.readouterr().out
    assert rc == 1
    assert "[FAIL] lpips-vgg" in out and "layout mismatch" in out
