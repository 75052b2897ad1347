#!/usr/bin/env python
"""Offline weight conversion: torch checkpoints -> native arrays.

Converts the external artifacts the reference consumes
(README.md:36-45 of the reference) into this framework's formats:

- ADM UNet checkpoints (diffusion_ffhq_10m.pt, 256x256_diffusion_uncond.pt)
  -> orbax parameter trees
- Lightning DWT-Var checkpoints (ffhq_dwt.ckpt) -> orbax {unet, out_cov}
- LPIPS: torchvision vgg16 state_dict + lpips 'vgg.pth' lin weights -> .npz
  for kdip_tpu.metrics.lpips_vgg
- recon_mse.pt (analytic variance tables) -> .npz
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kind", choices=["adm", "v2", "lpips", "inception",
                                    "recon_mse"])
    p.add_argument("--src", required=True, help="source torch file")
    p.add_argument("--lin", default=None,
                   help="lpips lin-layer weights file (for kind=lpips)")
    p.add_argument("--out", required=True, help="output path (dir or .npz)")
    args = p.parse_args(argv)

    from .. import ckpt

    if args.kind == "adm":
        params = ckpt.convert_adm_state_dict(ckpt.load_torch_checkpoint(args.src))
        ckpt.save_checkpoint(args.out, params)
        print(f"saved ADM params to {args.out}")
    elif args.kind == "v2":
        sd = ckpt.load_torch_checkpoint(args.src)
        prefix = "model_ema." if any(k.startswith("model_ema.") for k in sd) \
            else "model."
        sd_model = ckpt.strip_prefix(sd, prefix)
        params = {"unet": ckpt.convert_adm_state_dict(
                      ckpt.strip_prefix(sd_model, "inner_model.")),
                  "out_cov": ckpt.convert_v2_out_cov(sd_model)}
        ckpt.save_checkpoint(args.out, params)
        print(f"saved V2 params to {args.out}")
    elif args.kind == "lpips":
        from ..metrics import convert_lpips_weights
        vgg_sd = ckpt.load_torch_checkpoint(args.src)
        assert args.lin, "--lin (lpips lin weights, e.g. lpips/weights/v0.1/vgg.pth) required"
        lin_sd = ckpt.load_torch_checkpoint(args.lin)
        params = convert_lpips_weights(vgg_sd, lin_sd)
        flat = {}
        for mod, sub in params.items():
            for name, arr in sub.items():
                flat[f"{mod}.{name}"] = np.asarray(arr)
        np.savez(args.out, **flat)
        print(f"saved LPIPS weights ({len(flat)} arrays) to {args.out}")
    elif args.kind == "inception":
        # clean-fid / pytorch-fid InceptionV3 FID weights
        # (pt_inception-2015-12-05-*.pth, torchvision Inception3 naming;
        # ref consumer: k_diffusion/evaluation.py:17-34)
        from ..models.inception import convert_inception_state_dict
        params = convert_inception_state_dict(
            ckpt.load_torch_checkpoint(args.src))
        ckpt.save_checkpoint(args.out, params)
        print(f"saved InceptionV3 params to {args.out}")
    elif args.kind == "recon_mse":
        import torch
        data = torch.load(args.src, map_location="cpu")
        np.savez(args.out, **{k: np.asarray(v) for k, v in data.items()})
        print(f"saved recon_mse to {args.out}")


if __name__ == "__main__":
    main()
