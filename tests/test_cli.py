"""End-to-end CLI tests: sample_condition and analytic_variance run against
a synthetic checkpoint + dataset and produce the expected artifacts."""

import json
import os

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory, reference_path):
    """A 32px 'FFHQ-like' setup: random torch UNet checkpoint (.pt), model
    config JSON, operator YAML, and a 3-image dataset."""
    import torch
    from guided_diffusion.unet import UNetModel
    from PIL import Image

    root = tmp_path_factory.mktemp("cli")
    torch.manual_seed(0)
    unet = UNetModel(image_size=32, in_channels=3, model_channels=32,
                     out_channels=6, num_res_blocks=1, attention_resolutions={2},
                     dropout=0.0, channel_mult=(1, 2), num_heads=4,
                     num_head_channels=16, use_scale_shift_norm=True,
                     resblock_updown=True)
    ckpt_path = root / "model.pt"
    torch.save(unet.state_dict(), ckpt_path)

    data_dir = root / "val"
    data_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
            data_dir / f"{i}.png")

    config = {
        "model": {
            "type": "openai_ffhq",
            "input_channels": 3,
            "input_size": [32, 32],
            "sigma_min": 1e-2,
            "sigma_max": 80,
            "sigma_sample_density": {"type": "lognormal", "mean": -1.2,
                                     "std": 1.2},
            "openai": {"num_channels": 32, "num_res_blocks": 1,
                       "attention_resolutions": "16", "image_size": 32,
                       "num_head_channels": 16, "channel_mult": "1,2",
                       "dropout": 0.0},
        },
        "dataset": {"type": "imagefolder", "location": str(data_dir)},
    }
    config_path = root / "config.json"
    config_path.write_text(json.dumps(config))

    op_config = {"name": "inpainting", "sigma_s": 0.05,
                 "mask_opt": {"mask_type": "random",
                              "mask_prob_range": [0.5, 0.5],
                              "image_size": 32}}
    op_path = root / "inpainting.yaml"
    op_path.write_text(yaml.dump(op_config))
    return dict(root=root, ckpt=str(ckpt_path), config=str(config_path),
                op=str(op_path), data=str(data_dir))


def test_sample_condition_cli(tiny_env):
    from kdip_tpu.cli import sample_condition

    logdir = str(tiny_env["root"] / "logs")
    avg = sample_condition.main([
        "--checkpoint", tiny_env["ckpt"], "--config", tiny_env["config"],
        "--operator-config", tiny_env["op"], "--logdir", logdir,
        "--steps", "3", "--guidance", "I", "--xstart-cov-type", "convert",
        "--cg-maxiter", "20", "--max-images", "2", "--save-img",
        "--dtype", "float32"])
    assert os.path.exists(os.path.join(logdir, "avg_metrics.yaml"))
    assert os.path.exists(os.path.join(logdir, "args.yaml"))
    assert os.path.exists(os.path.join(logdir, "out_img_0_measurement.png"))
    assert os.path.exists(os.path.join(logdir, "out_img_0_hat_x0_sample_0.png"))
    saved = yaml.safe_load(open(os.path.join(logdir, "avg_metrics.yaml")))
    assert "psnr" in saved and "ssim" in saved
    assert np.isfinite(avg["psnr"])


def test_sample_condition_cli_dps(tiny_env):
    from kdip_tpu.cli import sample_condition

    logdir = str(tiny_env["root"] / "logs_dps")
    avg = sample_condition.main([
        "--checkpoint", tiny_env["ckpt"], "--config", tiny_env["config"],
        "--operator-config", tiny_env["op"], "--logdir", logdir,
        "--steps", "3", "--guidance", "dps", "--xstart-cov-type", "dps",
        "--zeta", "1.0", "--max-images", "1", "--ode", "--dtype", "float32"])
    assert np.isfinite(avg["psnr"])


def test_sample_condition_cli_bf16_precast(tiny_env):
    """The default bf16 dtype routes params through precast_inference_params
    (one tree-level cast; bit-identical to per-use promote_dtype casts) —
    the run must stay finite and produce metrics like the f32 path."""
    from kdip_tpu.cli import sample_condition

    logdir = str(tiny_env["root"] / "logs_bf16")
    avg = sample_condition.main([
        "--checkpoint", tiny_env["ckpt"], "--config", tiny_env["config"],
        "--operator-config", tiny_env["op"], "--logdir", logdir,
        "--steps", "3", "--guidance", "I", "--xstart-cov-type", "convert",
        "--cg-maxiter", "20", "--max-images", "1",
        "--dtype", "bfloat16"])
    assert np.isfinite(avg["psnr"])


def test_sample_uncond_cli(tiny_env):
    from kdip_tpu.cli import sample_uncond
    base = ["--checkpoint", tiny_env["ckpt"], "--config", tiny_env["config"],
            "-n", "2", "--steps", "3", "--dtype", "float32"]
    for sampler, extra in [("heun", []), ("ddim", ["--respacing", "5"]),
                           ("ancestral", ["--respacing", "5"])]:
        logdir = str(tiny_env["root"] / f"uncond_{sampler}")
        out = sample_uncond.main(base + ["--sampler", sampler,
                                         "--logdir", logdir] + extra)
        assert out.shape == (2, 32, 32, 3) and np.isfinite(out).all()
        assert os.path.exists(os.path.join(logdir, "sample_0.png"))


def test_analytic_variance_cli(tiny_env):
    from kdip_tpu.cli import analytic_variance

    logdir = str(tiny_env["root"] / "av")
    analytic_variance.main([
        "--config", tiny_env["config"], "--checkpoint", tiny_env["ckpt"],
        "--num-sigmas", "5", "--batch-size", "2", "--data-fraction", "1.0",
        "--logdir", logdir, "--dtype", "float32"])
    data = np.load(os.path.join(logdir, "recon_mse.npz"))
    assert data["sigmas"].shape == (5,)
    assert np.isfinite(data["mse_list"]).all()

    # --per-sample-map must produce the same MC table (same keys/noise)
    logdir2 = str(tiny_env["root"] / "av_psm")
    analytic_variance.main([
        "--config", tiny_env["config"], "--checkpoint", tiny_env["ckpt"],
        "--num-sigmas", "5", "--batch-size", "2", "--data-fraction", "1.0",
        "--logdir", logdir2, "--dtype", "float32", "--per-sample-map"])
    data2 = np.load(os.path.join(logdir2, "recon_mse.npz"))
    np.testing.assert_allclose(data2["mse_list"], data["mse_list"],
                               rtol=1e-4)


def test_sample_condition_cli_v2(tiny_env):
    """--v2 path: Lightning-style checkpoint (model_ema.inner_model.* +
    model_ema.out_cov.*) through the learned-covariance guidance."""
    import torch
    from guided_diffusion.unet import UNetModel

    torch.manual_seed(0)
    unet = UNetModel(image_size=32, in_channels=3, model_channels=32,
                     out_channels=6, num_res_blocks=1, attention_resolutions={2},
                     dropout=0.0, channel_mult=(1, 2), num_heads=4,
                     num_head_channels=16, use_scale_shift_norm=True,
                     resblock_updown=True)
    out_cov = torch.nn.Conv2d(32, 6, 1)
    sd = {}
    for k, v in unet.state_dict().items():
        sd[f"model_ema.inner_model.{k}"] = v
    sd["model_ema.out_cov.weight"] = out_cov.weight.detach()
    sd["model_ema.out_cov.bias"] = out_cov.bias.detach()
    ckpt_path = str(tiny_env["root"] / "v2.ckpt")
    torch.save({"state_dict": sd}, ckpt_path)

    # dwt config variant
    import json
    cfg = json.load(open(tiny_env["config"]))
    cfg["model"]["ortho_tf_type"] = "dwt"
    cfg_path = str(tiny_env["root"] / "config_dwt.json")
    json.dump(cfg, open(cfg_path, "w"))

    from kdip_tpu.cli import sample_condition
    logdir = str(tiny_env["root"] / "logs_v2")
    avg = sample_condition.main([
        "--checkpoint", ckpt_path, "--config", cfg_path,
        "--operator-config", tiny_env["op"], "--logdir", logdir,
        "--steps", "3", "--guidance", "I", "--v2", "--cg-maxiter", "20",
        "--max-images", "1", "--ode", "--dtype", "float32"])
    assert np.isfinite(avg["psnr"])

    # --spatial-var disables the ortho transform
    avg2 = sample_condition.main([
        "--checkpoint", ckpt_path, "--config", cfg_path,
        "--operator-config", tiny_env["op"],
        "--logdir", str(tiny_env["root"] / "logs_v2s"),
        "--steps", "3", "--guidance", "I", "--v2", "--spatial-var",
        "--cg-maxiter", "20", "--max-images", "1", "--ode",
        "--dtype", "float32"])
    assert np.isfinite(avg2["psnr"])


def test_cli_seed_determinism(tiny_env):
    """Same --seed => bitwise-identical metrics (explicit key threading; the
    reference relies on global torch RNG and cannot guarantee this)."""
    from kdip_tpu.cli import sample_condition
    args = ["--checkpoint", tiny_env["ckpt"], "--config", tiny_env["config"],
            "--operator-config", tiny_env["op"], "--steps", "3",
            "--guidance", "pgdm", "--xstart-cov-type", "pgdm",
            "--max-images", "1", "--dtype", "float32", "--seed", "5"]
    a = sample_condition.main(args + ["--logdir", str(tiny_env["root"] / "d1")])
    b = sample_condition.main(args + ["--logdir", str(tiny_env["root"] / "d2")])
    assert a["psnr"] == b["psnr"] and a["ssim"] == b["ssim"]
    c = sample_condition.main(args[:-1] + ["7", "--logdir",
                                           str(tiny_env["root"] / "d3")])
    assert c["psnr"] != a["psnr"]


def test_box_mask_inpainting(tiny_env):
    """Box-mask operator config (paper's alternate mask type)."""
    import yaml as _yaml
    from kdip_tpu.cli import sample_condition
    op_config = {"name": "inpainting", "sigma_s": 0.05,
                 "mask_opt": {"mask_type": "box", "mask_len_range": [8, 9],
                              "image_size": 32}}
    op_path = str(tiny_env["root"] / "box.yaml")
    _yaml.dump(op_config, open(op_path, "w"))
    avg = sample_condition.main([
        "--checkpoint", tiny_env["ckpt"], "--config", tiny_env["config"],
        "--operator-config", op_path,
        "--logdir", str(tiny_env["root"] / "logs_box"),
        "--steps", "3", "--guidance", "II", "--xstart-cov-type", "convert",
        "--cg-maxiter", "20", "--max-images", "1", "--dtype", "float32"])
    assert np.isfinite(avg["psnr"])


def test_train_cli_smoke(tiny_env):
    from kdip_tpu.cli import train_openai

    logdir = str(tiny_env["root"] / "train")
    train_openai.main([
        "--config", tiny_env["config"], "--checkpoint", tiny_env["ckpt"],
        "--batch-size", "2", "--max-steps", "2", "--save-every", "2",
        "--logdir", logdir])
    assert os.path.exists(os.path.join(logdir, "train_log.csv"))
    assert os.path.exists(os.path.join(logdir, "state_2"))


def test_sample_condition_cli_dp_mesh(tiny_env):
    """--dp shards the image batch over the 8-device CPU mesh and matches
    the artifacts/metrics contract of the single-device path."""
    from kdip_tpu.cli import sample_condition

    logdir = str(tiny_env["root"] / "logs_dp")
    avg = sample_condition.main([
        "--checkpoint", tiny_env["ckpt"], "--config", tiny_env["config"],
        "--operator-config", tiny_env["op"], "--logdir", logdir,
        "--steps", "3", "--guidance", "I", "--xstart-cov-type", "convert",
        "--cg-maxiter", "20", "--max-images", "2", "--batch-size", "8",
        "--dp", "--dtype", "float32"])
    assert np.isfinite(avg["psnr"])
    assert os.path.exists(os.path.join(logdir, "avg_metrics.yaml"))


def test_sample_condition_cli_dpmpp(tiny_env):
    """--sampler dpmpp_2m: the fewer-NFE guided chain (capability past the
    reference's heun/euler-only CLI)."""
    from kdip_tpu.cli import sample_condition

    logdir = str(tiny_env["root"] / "logs_dpmpp")
    avg = sample_condition.main([
        "--checkpoint", tiny_env["ckpt"], "--config", tiny_env["config"],
        "--operator-config", tiny_env["op"], "--logdir", logdir,
        "--steps", "4", "--guidance", "I", "--xstart-cov-type", "convert",
        "--cg-maxiter", "20", "--max-images", "1", "--sampler", "dpmpp_2m",
        "--dtype", "float32"])
    assert np.isfinite(avg["psnr"])


def test_train_cli_resume(tiny_env):
    """--resume restores the full train state (params+opt+EMA+step) from
    train_state_latest and continues from the saved step."""
    from kdip_tpu.cli import train_openai

    logdir = str(tiny_env["root"] / "train_resume")
    common = ["--config", tiny_env["config"], "--checkpoint",
              tiny_env["ckpt"], "--logdir", logdir, "--batch-size", "2",
              "--save-every", "2", "--lr", "1e-4"]
    train_openai.main(common + ["--max-steps", "2"])
    assert os.path.isdir(os.path.join(logdir, "train_state_latest"))
    train_openai.main(common + ["--max-steps", "4", "--resume"])
    # both segment saves exist: step 2 from the first run, 4 from resume
    assert os.path.isdir(os.path.join(logdir, "state_2"))
    assert os.path.isdir(os.path.join(logdir, "state_4"))


def test_train_cli_preemption_sigterm(tiny_env):
    """SIGTERM mid-training saves a resumable state and exits cleanly."""
    import signal
    import subprocess
    import sys

    logdir = str(tiny_env["root"] / "train_preempt")
    proc = subprocess.Popen(
        [sys.executable, "-m", "kdip_tpu.cli.train_openai",
         "--config", tiny_env["config"], "--checkpoint", tiny_env["ckpt"],
         "--logdir", logdir, "--batch-size", "2", "--save-every", "1000",
         "--max-steps", "1000"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    # wait for training to actually start, then preempt
    while True:
        line = proc.stdout.readline()
        if "step 1:" in line:
            break
        assert proc.poll() is None, "train CLI exited early"
    proc.send_signal(signal.SIGTERM)
    out = proc.stdout.read()
    assert proc.wait(timeout=300) == 0
    assert "preempted at step" in out
    assert os.path.isdir(os.path.join(logdir, "train_state_latest"))


def test_sample_condition_cli_resume(tiny_env):
    """--resume skips journaled images and reproduces the uninterrupted
    run's outputs exactly (per-index folded PRNG keys)."""
    from kdip_tpu.cli import sample_condition

    base = ["--checkpoint", tiny_env["ckpt"], "--config", tiny_env["config"],
            "--operator-config", tiny_env["op"], "--steps", "3",
            "--guidance", "I", "--xstart-cov-type", "convert",
            "--cg-maxiter", "20", "--dtype", "float32"]

    full_dir = str(tiny_env["root"] / "logs_full")
    avg_full = sample_condition.main(
        base + ["--logdir", full_dir, "--max-images", "3"])

    part_dir = str(tiny_env["root"] / "logs_part")
    sample_condition.main(base + ["--logdir", part_dir, "--max-images", "2"])
    # resume to 3 images: image 0,1 skipped via the journal, 2 computed
    avg_res = sample_condition.main(
        base + ["--logdir", part_dir, "--max-images", "3", "--resume"])

    assert avg_res["psnr"] == pytest.approx(avg_full["psnr"], abs=1e-4)
    lines = open(os.path.join(part_dir, "metrics.jsonl")).read().splitlines()
    assert len(lines) == 4  # header + 3 images

    # per-image keys fold the batch-start index, so a resume with a
    # different batch layout must be refused, not silently mixed
    with pytest.raises(SystemExit, match="different settings"):
        sample_condition.main(
            base + ["--logdir", part_dir, "--max-images", "3", "--resume",
                    "--batch-size", "3"])


def test_mle_sigma_thres_defaults_per_mode():
    """The unified CLI resolves --mle-sigma-thres like the reference's two
    scripts: 0.2 for v1 (sample_condition_openai.py:97), 1.0 with --v2
    (sample_condition_openai_v2.py:90)."""
    from kdip_tpu.cli.sample_condition import build_argparser

    p = build_argparser()
    assert p.parse_args([]).mle_sigma_thres is None
    assert p.parse_args(["--mle-sigma-thres", "0.5"]).mle_sigma_thres == 0.5
    # resolution logic mirrored from main()
    for v2, want in ((False, 0.2), (True, 1.0)):
        argv = ["--v2"] if v2 else []
        args = p.parse_args(argv)
        thres = args.mle_sigma_thres
        if thres is None:
            thres = 1.0 if args.v2 else 0.2
        assert thres == want


def test_sample_condition_cli_native_dct_var(tiny_env, reference_path):
    """Guided sampling with the k-diffusion NATIVE DCT-Var model
    (ImageDenoiserModelV2) — the reference ships configs/test_ffhq_dct.json
    for this model family but no entry point can consume it."""
    import json as _json

    import torch
    from k_diffusion.models.image_v2 import ImageDenoiserModelV2 as RefModel

    from kdip_tpu.cli import sample_condition

    torch.manual_seed(0)
    ref = RefModel(3, 64, [1, 2], [32, 64], [False, True],
                   mapping_cond_dim=9, has_variance=True).eval()
    ck = str(tiny_env["root"] / "native_dct.pt")
    torch.save(ref.state_dict(), ck)

    cfg = {
        "model": {
            "type": "image_v2", "input_channels": 3, "input_size": [32, 32],
            "patch_size": 1, "mapping_out": 64, "depths": [1, 2],
            "channels": [32, 64], "self_attn_depths": [False, True],
            "has_variance": True, "dropout_rate": 0.0,
            "augment_wrapper": True, "augment_prob": 0.0, "sigma_data": 0.5,
            "sigma_min": 1e-2, "sigma_max": 80,
            "sigma_sample_density": {"type": "cosine"},
            "ortho_tf_type": "dct",
        },
        "dataset": {"type": "imagefolder", "location": tiny_env["data"]},
    }
    cfg_path = str(tiny_env["root"] / "native_dct.json")
    open(cfg_path, "w").write(_json.dumps(cfg))

    logdir = str(tiny_env["root"] / "logs_native")
    avg = sample_condition.main([
        "--checkpoint", ck, "--config", cfg_path,
        "--operator-config", tiny_env["op"], "--logdir", logdir,
        "--steps", "4", "--guidance", "I", "--ode",
        "--cg-maxiter", "20", "--max-images", "1", "--dtype", "float32"])
    assert np.isfinite(avg["psnr"])
    assert os.path.exists(os.path.join(logdir, "avg_metrics.yaml"))


def test_evaluate_cli_fid_pipeline_with_dp(tiny_env, tmp_path):
    """FID/KID through the full evaluate CLI path (VERDICT r2 next #5):
    folder streaming -> backbone features -> fid/kid, including --dp
    sharded feature extraction over the device mesh (the reference's
    accelerate gather, k_diffusion/evaluation.py:53-63) and the inception
    backbone with (random) converted weights through the same orbax
    loading the real eval would use."""
    from PIL import Image

    from kdip_tpu.cli import evaluate

    rng = np.random.RandomState(7)
    fake_dir = tmp_path / "fake"
    fake_dir.mkdir()
    for i in range(3):
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
            fake_dir / f"{i}.png")

    base = [tiny_env["data"], str(fake_dir), "--size", "32",
            "--batch-size", "2"]
    out_dp = evaluate.main(base + ["--backbone", "pixels", "--dp"])
    assert out_dp["n_real"] == out_dp["n_fake"] == 3
    assert np.isfinite(out_dp["fid"]) and out_dp["fid"] > 0
    assert np.isfinite(out_dp["kid"])

    # sharded and unsharded extraction are the same computation
    out_local = evaluate.main(base + ["--backbone", "pixels"])
    assert out_dp["fid"] == pytest.approx(out_local["fid"], rel=1e-5)
    assert out_dp["kid"] == pytest.approx(out_local["kid"], rel=1e-4, abs=1e-7)

    # inception backbone end-to-end (random weights; 75px is the smallest
    # size the v3 trunk reduces without collapsing)
    import jax
    import jax.numpy as jnp

    from kdip_tpu import ckpt
    from kdip_tpu.models.inception import InceptionV3Features

    model = InceptionV3Features()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 75, 75, 3)))
    wdir = tmp_path / "inc_weights"
    ckpt.save_checkpoint(str(wdir), jax.tree.map(np.asarray, dict(variables)))

    out_inc = evaluate.main(
        [tiny_env["data"], str(fake_dir), "--size", "75", "--batch-size", "2",
         "--backbone", "inception", "--weights", str(wdir), "--dp"])
    assert np.isfinite(out_inc["fid"]) and out_inc["backbone"] == "inception"
