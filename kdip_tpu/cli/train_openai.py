#!/usr/bin/env python
"""Variance-head fine-tuning CLI (the DWT/DCT-Var training).

Equivalent of the reference's `train_openai.py` (Lightning harness): loads a
pretrained OpenAI UNet checkpoint, attaches the `out_cov` variance head, and
fine-tunes with the dual NLL loss (spatial + ortho-domain) under Karras
augmentation, with EMA warmup and periodic sample previews
(ref: train_openai.py:35-143).

TPU-native: the train step is one jitted program data-parallel over the
device mesh (gradients all-reduce over ICI, replacing Lightning DDP),
checkpoints are orbax, and logging is CSV.
"""

from __future__ import annotations

import argparse
import csv
import os
import time

import numpy as np


def _save_preview(model, ema_params, tables, size, model_config, args, step):
    """EMA unconditional sample grid via dpmpp_2m
    (ref: train_openai.py:99-117 on_train_epoch_start preview)."""
    import jax
    import jax.numpy as jnp

    from .. import precond, samplers, schedules
    from .sample_condition import to_pil_image

    def model_apply(p, x_scaled, t):
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (x_scaled.shape[0],))
        eps, _, _ = model.apply({"params": p}, x_scaled, t)
        return eps

    denoise = precond.make_discrete_eps_denoiser(model_apply, tables.log_sigmas)
    sigmas = schedules.get_sigmas_karras(args.preview_steps,
                                         model_config.get("sigma_min", 1e-2),
                                         model_config.get("sigma_max", 80.0))
    key = jax.random.key(step)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (4, size, size, 3)) * sigmas[0]
    out = samplers.sample_dpmpp_2m(
        lambda xx, s, k: denoise(ema_params, xx, s), x, sigmas, k2)
    import numpy as np
    grid = np.concatenate(list(np.asarray(out)), axis=1)
    to_pil_image(grid).save(os.path.join(args.logdir, f"preview_{step}.png"))


def main(argv=None):
    from ..utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from .. import ckpt, config as kconfig, train
    from ..data import FolderOfImages, KarrasAugmentationPipeline, augment_batch
    from ..models import adm as adm_mod
    from ..ops.transforms import OrthoTransform
    from ..parallel import sharding as sh
    from ..utils import EMAWarmup, make_sample_density

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True,
                   help="pretrained OpenAI UNet .pt (or orbax dir)")
    p.add_argument("--batch-size", type=int, default=12)
    p.add_argument("--accum", type=int, default=1,
                   help="gradient accumulation steps")
    p.add_argument("--per-sample-map", dest="per_sample_map",
                   action="store_true", default=True,
                   help="per-example gradient scan (batch-1 conv layout; "
                        "1.74x faster than batched grads for the 256px ADM "
                        "fine-tune on v5e, identical updates — RESULTS.md)")
    p.add_argument("--no-per-sample-map", dest="per_sample_map",
                   action="store_false")
    p.add_argument("--num-workers", type=int, default=8,
                   help="native C++ decode threads for the input pipeline "
                        "(ref: train_openai.py:43 DataLoader num_workers; "
                        "0 = synchronous Python loading)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--max-steps", type=int, default=10000)
    p.add_argument("--save-every", type=int, default=1000)
    p.add_argument("--resume", action="store_true",
                   help="continue from <logdir>/train_state_latest (full "
                        "params+optimizer+EMA state, written at every save "
                        "— the equivalent of the reference's Lightning "
                        "--checkpoint resume)")
    p.add_argument("--preview-every", type=int, default=0,
                   help="if >0, save a dpmpp_2m EMA sample grid every N steps "
                        "(ref: train_openai.py:106-117 per-epoch preview)")
    p.add_argument("--preview-steps", type=int, default=50)
    p.add_argument("--logdir", type=str, default="runs/train_openai")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    config = kconfig.load_config(args.config)
    model_config = config["model"]
    unet, tables = kconfig.make_openai_model(model_config)
    model = adm_mod.ADMUNetV2(unet=unet)
    size = model_config["input_size"][0]

    # init head, load pretrained torso (ref: train_openai.py:119-129)
    params = model.init(jax.random.key(args.seed),
                        jnp.zeros((1, size, size, 3)), jnp.zeros((1,)))["params"]
    if os.path.isdir(args.checkpoint):
        unet_params = ckpt.load_checkpoint(args.checkpoint)
    else:
        unet_params = ckpt.convert_adm_state_dict(
            ckpt.load_torch_checkpoint(args.checkpoint))
    params = dict(params)
    params["unet"] = unet_params

    ortho_tf = OrthoTransform(model_config.get("ortho_tf_type"))
    density = make_sample_density(model_config,
                                  sigma_data=model_config.get("sigma_data", 1.0),
                                  sigma_min=model_config.get("sigma_min", 1e-2),
                                  sigma_max=model_config.get("sigma_max", 80.0))

    def model_apply_v2(p, x_scaled, t):
        return model.apply({"params": p}, x_scaled, t, deterministic=True)

    def loss_fn(p, x0, noise, sigma):
        return train.openai_v2_loss(model_apply_v2, p, x0, noise, sigma,
                                    tables.log_sigmas, ortho_tf)

    optimizer = optax.adam(args.lr)
    if args.accum > 1:
        optimizer = optax.MultiSteps(optimizer, args.accum)
    state = train.create_train_state(params, optimizer)
    start_step = 0
    resume_dir = os.path.join(args.logdir, "train_state_latest")
    if args.resume and os.path.isdir(resume_dir):
        template = {"step": 0, "params": state.params,
                    "ema_params": state.ema_params,
                    "opt_state": state.opt_state}
        loaded = ckpt.load_checkpoint(resume_dir, target=template)
        start_step = int(loaded["step"])
        state = train.TrainState(step=jnp.asarray(start_step),
                                 params=loaded["params"],
                                 opt_state=loaded["opt_state"],
                                 ema_params=loaded["ema_params"])
        print(f"resumed from {resume_dir} at step {start_step}", flush=True)

    n_dev = len(jax.devices())
    while args.batch_size % n_dev:
        n_dev -= 1
    # per-sample-map scans over the (global) batch axis — only a win on a
    # single device; under the dp mesh the scan would serialize the shards
    psm = args.per_sample_map and args.batch_size > 1 and n_dev == 1
    step_fn = jax.jit(train.make_train_step(
        loss_fn, optimizer, density, per_sample_map=psm))
    mesh = sh.make_mesh(n_dev)
    state = sh.replicate(state, mesh)

    ema_sched = EMAWarmup(power=config["ema_sched"]["power"],
                          max_value=config["ema_sched"]["max_value"])
    aug = KarrasAugmentationPipeline(
        a_prob=model_config.get("augment_prob", 0.0))
    dataset = FolderOfImages(config["dataset"]["location"], size=size)
    assert len(dataset) > 0, f"no images under {config['dataset']['location']}"

    os.makedirs(args.logdir, exist_ok=True)
    log_path = os.path.join(args.logdir, "train_log.csv")
    log_file = open(log_path, "a", newline="")
    logger = csv.writer(log_file)
    logger.writerow(["step", "loss", "ema_decay", "time"])
    # TensorBoard scalar curves (ref: train_openai.py:70 TensorBoardLogger)
    from ..tfevents import EventFileWriter
    tb = EventFileWriter(os.path.join(args.logdir, "tb"))

    # Preemption safety (TPU maintenance events deliver SIGTERM): request a
    # clean stop; the loop saves train_state_latest and exits 0, so a
    # --resume relaunch continues where it left off. The reference has no
    # preemption handling (SURVEY aux: Lightning restart only).
    import signal
    stop_requested = {"flag": False}

    def _on_sigterm(signum, frame):
        stop_requested["flag"] = True

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # non-main thread (e.g. under some test runners)

    key = jax.random.key(args.seed + start_step)
    step = start_step
    t0 = time.time()
    for _ in range(start_step):
        ema_sched.step()  # fast-forward the EMA warmup schedule
    try:
        while step < args.max_steps:
            for batch in dataset.batches(args.batch_size, drop_last=True,
                                         shuffle=True, seed=args.seed + step,
                                         num_workers=args.num_workers):
                if step >= args.max_steps:
                    break
                aug_imgs, _, _ = augment_batch(aug, batch, seed=step)
                key, k_step = jax.random.split(key)
                decay = ema_sched.get_value()
                state, m = step_fn(state,
                                   sh.shard_batch(jnp.asarray(aug_imgs), mesh),
                                   k_step, decay)
                ema_sched.step()
                step += 1
                if step % 50 == 0 or step == 1:
                    loss = float(m["loss"])
                    print(f"step {step}: loss {loss:.4f} ema {decay:.5f}",
                          flush=True)
                    logger.writerow([step, loss, decay, time.time() - t0])
                    log_file.flush()
                    tb.add_scalars(step, [("train/loss", loss),
                                          ("train/ema_decay", decay)])
                if args.preview_every and step % args.preview_every == 0:
                    _save_preview(model, state.ema_params, tables, size,
                                  model_config, args, step)
                if stop_requested["flag"]:
                    raise KeyboardInterrupt
                if step % args.save_every == 0 or step == args.max_steps:
                    ckpt.save_checkpoint(
                        os.path.join(args.logdir, f"state_{step}"),
                        jax.device_get(state.ema_params))
                    ckpt.save_checkpoint(
                        os.path.join(args.logdir, "train_state_latest"),
                        jax.device_get({"step": step,
                                        "params": state.params,
                                        "ema_params": state.ema_params,
                                        "opt_state": state.opt_state}))
    except KeyboardInterrupt:
        # graceful interrupt / preemption: keep the EMA weights AND the full
        # resumable state (every reference entry point catches
        # KeyboardInterrupt, e.g. sample_condition_openai.py:214-217)
        why = "preempted" if stop_requested["flag"] else "interrupted"
        print(f"{why} at step {step} — saving checkpoint", flush=True)
        if step > 0:
            ckpt.save_checkpoint(os.path.join(args.logdir, f"state_{step}"),
                                 jax.device_get(state.ema_params))
            ckpt.save_checkpoint(
                os.path.join(args.logdir, "train_state_latest"),
                jax.device_get({"step": step, "params": state.params,
                                "ema_params": state.ema_params,
                                "opt_state": state.opt_state}))
    finally:
        log_file.close()
        tb.close()
    print(f"done: {step} steps in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
