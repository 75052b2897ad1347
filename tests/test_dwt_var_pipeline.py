"""Full DWT-Var pipeline (the paper's headline contribution) end to end:
pretrain a base model -> fine-tune the variance head via the train CLI ->
guided sampling with the learned covariance via the sample CLI (--v2)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from kdip_tpu import ckpt, ddpm_sampling, diffusion
from kdip_tpu.models import adm

SIZE = 16


@pytest.fixture(scope="module")
def pretrained_env(tmp_path_factory):
    """Pretrains a tiny base model on synthetic gradients and writes the
    orbax checkpoint + configs + a small dataset folder."""
    from PIL import Image
    root = tmp_path_factory.mktemp("dwtvar")

    model = adm.ADMUNet(image_size=SIZE, model_channels=32, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_heads=2, num_head_channels=16, out_channels=6)
    params = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)),
                        jnp.zeros((1,)))["params"]
    tables = diffusion.make_diffusion(1000, "linear")

    def synth(key, n):
        k1, k2, k3 = jax.random.split(key, 3)
        xs = jnp.linspace(-1, 1, SIZE)
        yy, xx = jnp.meshgrid(xs, xs, indexing="ij")
        theta = jax.random.uniform(k1, (n, 1, 1, 1)) * 2 * jnp.pi
        ramp = (jnp.cos(theta) * xx[None, :, :, None]
                + jnp.sin(theta) * yy[None, :, :, None])
        c0 = jax.random.uniform(k2, (n, 1, 1, 3)) * 2 - 1
        c1 = jax.random.uniform(k3, (n, 1, 1, 3)) * 2 - 1
        return jnp.clip(c0 + (c1 - c0) * (ramp + 1) / 2, -1, 1)

    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch, key):
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(k_t, (batch.shape[0],), 0, 1000)

        def loss_fn(p):
            terms = ddpm_sampling.training_losses(
                tables, lambda x, tt: model.apply({"params": p}, x,
                                                  tt.astype(jnp.float32)),
                batch, t, k_n, loss_type="rescaled_mse")
            return jnp.mean(terms["loss"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(1)
    for i in range(100):
        key, k_b, k_s = jax.random.split(key, 3)
        params, opt_state, _ = step(params, opt_state, synth(k_b, 16), k_s)

    ckpt_dir = str(root / "base_unet")
    ckpt.save_checkpoint(ckpt_dir, jax.device_get(params))

    # dataset folder of synthetic images
    data_dir = root / "train"
    data_dir.mkdir()
    imgs = np.asarray((synth(jax.random.key(9), 12) + 1) / 2 * 255).astype(np.uint8)
    for i, im in enumerate(imgs):
        Image.fromarray(im).save(data_dir / f"{i}.png")

    config = {
        "model": {
            "type": "openai_ffhq", "input_channels": 3,
            "input_size": [SIZE, SIZE], "sigma_min": 1e-2, "sigma_max": 80,
            "sigma_data": 0.5, "augment_prob": 0.0,
            "sigma_sample_density": {"type": "cosine"},
            "openai": {"num_channels": 32, "num_res_blocks": 1,
                       "attention_resolutions": "8", "image_size": SIZE,
                       "num_head_channels": 16, "channel_mult": "1,2",
                       "dropout": 0.0},
            "ortho_tf_type": "dwt",
        },
        "dataset": {"type": "imagefolder", "location": str(data_dir)},
        "ema_sched": {"power": 0.6667, "max_value": 0.9999},
    }
    config_path = root / "config_dwt.json"
    config_path.write_text(json.dumps(config))
    return dict(root=root, ckpt=ckpt_dir, config=str(config_path),
                data=str(data_dir))


def test_dwt_var_train_then_sample(pretrained_env):
    from kdip_tpu.cli import train_openai, sample_condition
    import yaml

    # 1. fine-tune the variance head (dual NLL, DWT domain) via the CLI
    logdir = str(pretrained_env["root"] / "ft")
    train_openai.main([
        "--config", pretrained_env["config"],
        "--checkpoint", pretrained_env["ckpt"],
        "--batch-size", "4", "--max-steps", "30", "--save-every", "30",
        "--lr", "1e-3", "--logdir", logdir])
    v2_ckpt = os.path.join(logdir, "state_30")
    assert os.path.isdir(v2_ckpt)

    # 2. guided sampling with the learned DWT covariance via the CLI
    op_config = {"name": "inpainting", "sigma_s": 0.05,
                 "mask_opt": {"mask_type": "random",
                              "mask_prob_range": [0.5, 0.5],
                              "image_size": SIZE}}
    op_path = str(pretrained_env["root"] / "inp.yaml")
    yaml.dump(op_config, open(op_path, "w"))
    out_logdir = str(pretrained_env["root"] / "sample")
    avg = sample_condition.main([
        "--checkpoint", v2_ckpt, "--config", pretrained_env["config"],
        "--operator-config", op_path, "--logdir", out_logdir,
        "--steps", "10", "--guidance", "I", "--v2", "--ode",
        "--cg-maxiter", "30", "--max-images", "2", "--dtype", "float32",
        # the CLI's --v2 default (1.0, matching the reference) trusts the
        # learned head over a wide sigma range; this head is only 30 steps
        # old, so pin the v1 threshold for a meaningful quality bar
        "--mle-sigma-thres", "0.2"])
    assert np.isfinite(avg["psnr"])
    # learned-covariance guided reconstruction of a half-masked image from a
    # trained model should be clearly better than noise (>15 dB)
    assert avg["psnr"] > 15.0
