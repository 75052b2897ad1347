"""Discrete-time DDPM training loop (guided-diffusion style).

Equivalent of the reference's `guided_diffusion/train_util.py` TrainLoop
(22-301): microbatched forward/backward with gradient accumulation,
loss-aware timestep importance sampling, a chain of EMA rates, periodic
checkpointing with step-parsed resume, and KV logging.

TPU-native shape: one jitted microbatch grad step accumulates into a grad
buffer (the reference's `no_sync` microbatching, train_util.py:180-230
becomes explicit accumulation); the optimizer applies once per macro step;
DDP all-reduce is replaced by dp-mesh sharding of each microbatch. The
reference's fp16 dynamic loss scaling (fp16_util.py) is unnecessary with a
bf16 torso + fp32 params and is therefore intentionally absent.
"""

from __future__ import annotations

import os
import re
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import ckpt as ckpt_lib
from . import logger
from .diffusion import DiffusionTables
from .ddpm_sampling import training_losses
from .resample import LossAwareSampler, ScheduleSampler, UniformSampler
from .utils import ema_update


def find_resume_checkpoint(logdir: str) -> Optional[str]:
    """Finds the latest model checkpoint dir like model_NNNN
    (ref: train_util.py:258-292 parse_resume_step_from_filename)."""
    if not os.path.isdir(logdir):
        return None
    best = None
    best_step = -1
    for name in os.listdir(logdir):
        m = re.fullmatch(r"model_(\d+)", name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(logdir, name)
    return best


class TrainLoop:
    """(ref: guided_diffusion/train_util.py:22-301)

    model_fn(params, x_t, t) -> raw model output (eps [+ var values]).
    """

    def __init__(self, *, model_fn: Callable, params, tables: DiffusionTables,
                 data, batch_size: int, microbatch: int = -1, lr: float = 1e-4,
                 ema_rate="0.9999", log_interval: int = 10,
                 save_interval: int = 10000, logdir: str = "runs/train",
                 schedule_sampler: Optional[ScheduleSampler] = None,
                 weight_decay: float = 0.0, lr_anneal_steps: int = 0,
                 loss_type: str = "mse", learn_sigma: bool = True,
                 resume: bool = True, mesh=None, seed: int = 0,
                 measure_gns: bool = False):
        self.model_fn = model_fn
        self.tables = tables
        self.data = data  # iterator of [B, H, W, C] numpy batches
        self.batch_size = batch_size
        self.microbatch = microbatch if microbatch > 0 else batch_size
        self.lr = lr
        self.ema_rate = ([ema_rate] if isinstance(ema_rate, float)
                         else [float(x) for x in str(ema_rate).split(",")])
        self.log_interval = log_interval
        self.save_interval = save_interval
        self.logdir = logdir
        self.schedule_sampler = schedule_sampler or UniformSampler(
            tables.num_timesteps)
        self.lr_anneal_steps = lr_anneal_steps
        self.loss_type = loss_type
        self.learn_sigma = learn_sigma
        self.mesh = mesh
        self.rng = np.random.RandomState(seed)
        self.key = jax.random.key(seed)

        self.step = 0
        self.params = params
        if weight_decay:
            self.opt = optax.adamw(self._lr_schedule, weight_decay=weight_decay)
        else:
            self.opt = optax.adam(self._lr_schedule)
        self.opt_state = self.opt.init(params)
        self.ema_params: List[Any] = [jax.tree.map(jnp.copy, params)
                                      for _ in self.ema_rate]

        if resume:
            self._maybe_resume()

        # gradient noise scale (ref: k_diffusion/gns.py via DDP comm hook;
        # here the microbatch gradients ARE the small-batch statistics)
        self.gns = None
        if measure_gns:
            if self.microbatch >= self.batch_size:
                raise ValueError("measure_gns needs microbatch < batch_size "
                                 "(two batch sizes to contrast)")
            from .gns import GradientNoiseScale
            self.gns = GradientNoiseScale()

        self._micro_grad = jax.jit(self._micro_grad_fn)
        self._apply_update = jax.jit(self._apply_update_fn)
        self._sq_norm = jax.jit(lambda tree: sum(
            jnp.sum(l.astype(jnp.float32) ** 2)
            for l in jax.tree.leaves(tree)))

    # lr annealing (ref: train_util.py:214-220)
    def _lr_schedule(self, step):
        if not self.lr_anneal_steps:
            return self.lr
        frac_done = jnp.minimum(step / self.lr_anneal_steps, 1.0)
        return self.lr * (1 - frac_done)

    def _micro_grad_fn(self, params, batch, t, weights, key):
        def loss_fn(p):
            terms = training_losses(self.tables, lambda x, tt: self.model_fn(p, x, tt),
                                    batch, t, key, loss_type=self.loss_type,
                                    learn_sigma=self.learn_sigma)
            return jnp.mean(terms["loss"] * weights), terms
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, terms, grads

    def _apply_update_fn(self, params, opt_state, grads, ema_params_list):
        updates, opt_state = self.opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_emas = [ema_update(e, new_params, rate)
                    for e, rate in zip(ema_params_list, self.ema_rate)]
        return new_params, opt_state, new_emas

    def run_loop(self, max_steps: Optional[int] = None):
        """(ref: train_util.py:153-178). DIFFUSION_TRAINING_TEST env var
        short-circuits after the first save, like train_util.py:164-166."""
        test_mode = bool(os.environ.get("DIFFUSION_TRAINING_TEST"))
        for batch in self.data:
            if max_steps is not None and self.step >= max_steps:
                break
            self.run_step(np.asarray(batch))
            if self.step % self.log_interval == 0:
                logger.dumpkvs()
            if self.step % self.save_interval == 0:
                self.save()
                if test_mode:
                    return
        if max_steps is None or self.step % self.save_interval != 0:
            self.save()

    def run_step(self, batch: np.ndarray):
        """One macro step = accumulated microbatches + optimizer apply
        (ref: train_util.py:180-230 forward_backward + optimize)."""
        total_grads = None
        n_micro = 0
        sq_small_sum = 0.0
        for i in range(0, batch.shape[0], self.microbatch):
            micro = jnp.asarray(batch[i:i + self.microbatch])
            t, weights = self.schedule_sampler.sample(micro.shape[0], self.rng)
            self.key, k = jax.random.split(self.key)
            loss, terms, grads = self._micro_grad(self.params, micro,
                                                  jnp.asarray(t),
                                                  jnp.asarray(weights), k)
            if isinstance(self.schedule_sampler, LossAwareSampler):
                self.schedule_sampler.update_with_local_losses(
                    t, np.asarray(terms["loss"]))
            total_grads = grads if total_grads is None else jax.tree.map(
                jnp.add, total_grads, grads)
            n_micro += 1
            if self.gns is not None:
                sq_small_sum += float(self._sq_norm(grads))
            logger.logkv_mean("loss", float(loss))
            if "vb" in terms:
                logger.logkv_mean("vb", float(jnp.mean(terms["vb"])))
            logger.logkv_mean("mse", float(jnp.mean(terms["mse"])))
        grads = jax.tree.map(lambda g: g / n_micro, total_grads)
        if self.gns is not None and n_micro > 1:
            gns_val = self.gns.update(sq_small_sum / n_micro,
                                      float(self._sq_norm(grads)),
                                      self.microbatch, self.batch_size)
            logger.logkv("gns", gns_val)
        self.params, self.opt_state, self.ema_params = self._apply_update(
            self.params, self.opt_state, grads, self.ema_params)
        self.step += 1
        logger.logkv("step", self.step)
        logger.logkv("samples", self.step * self.batch_size)

    def save(self):
        """(ref: train_util.py:232-255): model_N, ema_{rate}_N, opt_N."""
        os.makedirs(self.logdir, exist_ok=True)
        ckpt_lib.save_checkpoint(os.path.join(self.logdir, f"model_{self.step}"),
                                 jax.device_get(self.params))
        for rate, ema in zip(self.ema_rate, self.ema_params):
            ckpt_lib.save_checkpoint(
                os.path.join(self.logdir, f"ema_{rate}_{self.step}"),
                jax.device_get(ema))
        ckpt_lib.save_checkpoint(os.path.join(self.logdir, f"opt_{self.step}"),
                                 jax.device_get(self.opt_state))
        logger.log(f"saved checkpoint at step {self.step}")

    def _maybe_resume(self):
        """(ref: train_util.py:110-151)"""
        model_ckpt = find_resume_checkpoint(self.logdir)
        if model_ckpt is None:
            return
        step = int(model_ckpt.rsplit("_", 1)[1])
        self.params = ckpt_lib.load_checkpoint(model_ckpt,
                                               jax.device_get(self.params))
        opt_path = os.path.join(self.logdir, f"opt_{step}")
        if os.path.isdir(opt_path):
            self.opt_state = ckpt_lib.load_checkpoint(
                opt_path, jax.device_get(self.opt_state))
        for i, rate in enumerate(self.ema_rate):
            ema_path = os.path.join(self.logdir, f"ema_{rate}_{step}")
            if os.path.isdir(ema_path):
                self.ema_params[i] = ckpt_lib.load_checkpoint(
                    ema_path, jax.device_get(self.ema_params[i]))
        self.step = step
        logger.log(f"resumed from step {step}")
