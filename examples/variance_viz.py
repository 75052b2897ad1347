#!/usr/bin/env python
"""Visualize learned posterior variance maps against true squared error.

Equivalent of the reference's `assets/viz.ipynb`: noise an image at a chosen
sigma, run the V2 (variance-head) model, and save side-by-side maps of the
predicted spatial/ortho-domain variance vs the actual squared reconstruction
error.

Usage:
  python -m examples.variance_viz --config configs/test_ffhq_dwt.json \
      --checkpoint path/to/ffhq_dwt.ckpt --image path/to/img.png
"""

import argparse
import os

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from kdip_tpu import ckpt, config as kconfig, precond
    from kdip_tpu.models import adm
    from kdip_tpu.ops.transforms import OrthoTransform

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--sigma", type=float, default=1.0)
    p.add_argument("--out", default="runs/variance_viz")
    args = p.parse_args()

    config = kconfig.load_config(args.config)
    mc = config["model"]
    unet, tables = kconfig.make_openai_model(mc)
    model = adm.ADMUNetV2(unet=unet)

    sd = ckpt.load_torch_checkpoint(args.checkpoint)
    prefix = "model_ema." if any(k.startswith("model_ema.") for k in sd) else "model."
    sd_model = ckpt.strip_prefix(sd, prefix)
    params = {"unet": ckpt.convert_adm_state_dict(
                  ckpt.strip_prefix(sd_model, "inner_model.")),
              "out_cov": ckpt.convert_v2_out_cov(sd_model)}

    from PIL import Image
    size = mc["input_size"][0]
    img = Image.open(args.image).convert("RGB").resize((size, size))
    x0 = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1)[None]

    sigma = jnp.float32(args.sigma)
    key = jax.random.key(0)
    noised = x0 + sigma * jax.random.normal(key, x0.shape)
    c_out, c_in = precond.eps_scalings(sigma)
    t = precond.sigma_to_t(tables.log_sigmas, sigma)
    eps, logvar, logvar_ot = model.apply(
        {"params": params}, noised * c_in, jnp.broadcast_to(t, (1,)))
    x0_mean = eps * c_out + noised

    ortho_tf = OrthoTransform(mc.get("ortho_tf_type"))
    err_sq = (x0_mean - x0) ** 2
    err_sq_ot = (ortho_tf(x0_mean) - ortho_tf(x0)) ** 2
    pred_var = jnp.exp(logvar) * c_out ** 2
    pred_var_ot = jnp.exp(logvar_ot) * c_out ** 2

    os.makedirs(args.out, exist_ok=True)

    def save_map(arr, name):
        a = np.asarray(arr[0]).mean(-1)
        a = np.log10(np.maximum(a, 1e-8))
        a = (a - a.min()) / max(a.max() - a.min(), 1e-8)
        Image.fromarray((a * 255).astype(np.uint8)).save(
            os.path.join(args.out, f"{name}.png"))

    save_map(err_sq, "true_sq_error_spatial")
    save_map(pred_var, "predicted_var_spatial")
    save_map(err_sq_ot, "true_sq_error_ortho")
    save_map(pred_var_ot, "predicted_var_ortho")
    corr = np.corrcoef(np.log(np.asarray(pred_var).ravel() + 1e-8),
                       np.log(np.asarray(err_sq).ravel() + 1e-8))[0, 1]
    print(f"log-variance vs log-error correlation (spatial): {corr:.3f}")
    print(f"maps written to {args.out}/")


if __name__ == "__main__":
    main()
