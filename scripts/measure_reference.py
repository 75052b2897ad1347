#!/usr/bin/env python
"""Measure the PyTorch reference pipeline on this host's CPU.

Grounds BASELINE.md / bench.py's ``vs_baseline`` in an actual measurement:
runs the reference's flagship workload (FFHQ-256 guided posterior sampling:
`/root/reference/sample_condition_openai.py:71-217` — 50-step stochastic Heun,
Type-I guidance, "convert" posterior covariance, random-mask inpainting with
sigma_s=0.05) with randomly initialized weights (checkpoints are not shipped;
timing is weight-independent) and records:

  * raw UNet forward wall-clock at 256 px, batch 1
  * one full guided NFE (UNet fwd + autograd VJP + mat solve)
  * a short end-to-end `sample_heun` run, extrapolated to the 50-step default
    (= 99 guided NFEs)

Writes BASELINE_MEASURED.json at the repo root. Run:
    python scripts/measure_reference.py [--steps 2] [--nfe-reps 3]
"""

import argparse
import json
import os
import platform
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import refshim

refshim.install()

import torch  # noqa: E402

torch.set_num_threads(os.cpu_count() or 1)
torch.manual_seed(0)


def build_pipeline():
    from condition.condition import ConditionOpenAIDenoiser
    from condition.measurements import get_operator
    from guided_diffusion.script_util import (create_model_and_diffusion,
                                              model_and_diffusion_defaults)

    # Flag values the reference resolves for configs/test_ffhq.json: the
    # defaults of utils_model.create_argparser (utils_model.py:353-384)
    # restricted to model_and_diffusion_defaults() keys, with the config's
    # "openai" block applied. (Not imported: utils_model pulls in torchvision.)
    flags = model_and_diffusion_defaults()
    flags.update(dict(
        image_size=256, num_channels=128, num_res_blocks=1,
        attention_resolutions="16", dropout=0.1, learn_sigma=True,
        num_head_channels=64, resblock_updown=True,
        use_scale_shift_norm=True, use_fp16=False,
        diffusion_steps=1000, noise_schedule="linear"))
    inner_model, diffusion = create_model_and_diffusion(**flags)
    inner_model.eval()
    n_params = sum(p.numel() for p in inner_model.parameters())

    # configs/inpainting_config.yaml
    operator = get_operator(
        device="cpu", name="inpainting", sigma_s=0.05,
        mask_opt={"mask_type": "random", "mask_prob_range": (0.5, 0.5),
                  "image_size": 256})
    x0 = torch.rand(1, 3, 256, 256) * 2 - 1
    measurement = operator.forward(x0.clone(), flatten=True)
    cond_model = ConditionOpenAIDenoiser(
        inner_model=inner_model, diffusion=diffusion, operator=operator,
        measurement=measurement, guidance="I", x0_cov_type="convert",
        recon_mse=None, device="cpu").eval()
    return inner_model, diffusion, cond_model, n_params


def time_reps(fn, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), sum(ts) / len(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2,
                   help="Heun steps for the end-to-end timing run")
    p.add_argument("--nfe-reps", type=int, default=3)
    args = p.parse_args()

    inner_model, diffusion, cond_model, n_params = build_pipeline()
    from k_diffusion import sampling as ksampling

    x = torch.randn(1, 3, 256, 256)
    t = torch.tensor([500])

    with torch.no_grad():
        inner_model(x, t)  # warmup
        fwd_min, fwd_mean = time_reps(lambda: inner_model(x, t), args.nfe_reps)

    sigma = torch.tensor([10.0])
    cond_model(x * sigma, sigma)  # warmup (builds autograd graph once)
    nfe_min, nfe_mean = time_reps(lambda: cond_model(x * sigma, sigma),
                                  args.nfe_reps)

    # Short end-to-end stochastic-Heun run (reference default churn settings,
    # sample_condition_openai.py:186-194), extrapolated to the 50-step default.
    sigmas = ksampling.get_sigmas_karras(args.steps, 1e-2, 80.0, rho=7.0)
    xT = torch.randn(1, 3, 256, 256) * 80.0
    t0 = time.perf_counter()
    ksampling.sample_heun(cond_model, xT, sigmas, s_churn=80, s_tmin=0.05,
                          s_tmax=50, s_noise=1.003, disable=True)
    e2e = time.perf_counter() - t0
    nfes_run = 2 * args.steps - 1
    per_nfe_e2e = e2e / nfes_run
    t50 = per_nfe_e2e * 99  # 50-step Heun = 99 guided NFEs
    samples_per_sec_50step = 1.0 / t50

    result = {
        "what": "reference torch pipeline, measured on this host (CPU)",
        "command": "python scripts/measure_reference.py "
                   f"--steps {args.steps} --nfe-reps {args.nfe_reps}",
        "workload": "FFHQ-256 guided sampling: Type-I guidance, convert "
                    "covariance, inpainting p=0.5 sigma_s=0.05, stochastic "
                    "Heun (s_churn=80) — sample_condition_openai.py defaults",
        "hardware": {
            "cpu": platform.processor() or platform.machine(),
            "cores": os.cpu_count(),
            "torch": torch.__version__,
            "torch_threads": torch.get_num_threads(),
        },
        "model_params": n_params,
        "unet_forward_sec": {"min": round(fwd_min, 3), "mean": round(fwd_mean, 3)},
        "guided_nfe_sec": {"min": round(nfe_min, 3), "mean": round(nfe_mean, 3)},
        "e2e_run": {"heun_steps": args.steps, "nfes": nfes_run,
                    "wall_sec": round(e2e, 3),
                    "sec_per_guided_nfe": round(per_nfe_e2e, 3)},
        "extrapolated_50step": {
            "nfes": 99, "wall_sec_per_sample": round(t50, 2),
            "samples_per_sec": samples_per_sec_50step,
        },
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_MEASURED.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
