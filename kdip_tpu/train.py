"""Training: EDM losses, dual-NLL variance losses, train state/step, and the
analytic-variance estimation job.

TPU-native equivalent of the reference training surface:
- `Denoiser.loss` / `DenoiserWithVariance.loss` (k_diffusion/layers.py:27-63)
- `OpenAIDenoiserV2.loss` — the DWT-Var fine-tuning objective
  (k_diffusion/external.py:145-159) driven by train_openai.py:90-97
- EMA warmup chain (train_openai.py:87-88, 131-140)
- `analytic_variance.py:113-139` — the Monte-Carlo per-sigma MSE table

Instead of Lightning/DDP, training is a pure jitted step over a `Mesh`
(parallel/sharding.py): gradients all-reduce over ICI via XLA.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from . import precond
from .ops.transforms import OrthoTransform
from .schedules import append_dims
from .utils import ema_update


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def edm_loss(model_apply: Callable, params, x0, noise, sigma,
             sigma_data: float = 1.0, **kwargs) -> jnp.ndarray:
    """Karras preconditioned denoising loss (ref: k_diffusion/layers.py:27-32).
    Returns per-example loss [B]."""
    c_skip, c_out, c_in = [append_dims(c, x0.ndim)
                           for c in precond.edm_scalings(sigma, sigma_data)]
    noised = x0 + noise * append_dims(sigma, x0.ndim)
    model_output = model_apply(params, noised * c_in, sigma, **kwargs)
    target = (x0 - c_skip * noised) / c_out
    return jnp.mean((model_output - target) ** 2, axis=tuple(range(1, x0.ndim)))


def simple_loss(denoise: Callable, params, x0, noise, sigma, **kwargs) -> jnp.ndarray:
    """L_simple through the full denoiser (ref: k_diffusion/layers.py:77-84)."""
    noised = x0 + noise * append_dims(sigma, x0.ndim)
    denoised = denoise(params, noised, sigma, **kwargs)
    eps = (noised - denoised) / append_dims(sigma, x0.ndim)
    return jnp.mean((eps - noise) ** 2, axis=tuple(range(1, x0.ndim)))


def variance_loss(model_apply: Callable, params, x0, noise, sigma,
                  ortho_tf: OrthoTransform, sigma_data: float = 1.0,
                  **kwargs) -> jnp.ndarray:
    """Dual NLL loss (spatial + ortho domain) for models with variance heads
    (ref: k_diffusion/layers.py:45-63 DenoiserWithVariance.loss).
    model_apply returns (model_output, logvar, logvar_ot)."""
    c_skip, c_out, c_in = [append_dims(c, x0.ndim)
                           for c in precond.edm_scalings(sigma, sigma_data)]
    noised = x0 + noise * append_dims(sigma, x0.ndim)
    model_output, logvar, logvar_ot = model_apply(params, noised * c_in, sigma,
                                                  **kwargs)
    target = (x0 - c_skip * noised) / c_out
    error = (model_output - target) ** 2
    error_ot = (ortho_tf(model_output) - ortho_tf(target)) ** 2
    losses = (error / jnp.exp(logvar) + logvar
              + error_ot / jnp.exp(logvar_ot) + logvar_ot)
    return jnp.mean(losses, axis=tuple(range(1, x0.ndim)))


def openai_v2_loss(model_apply_v2: Callable, params, x0, noise, sigma,
                   log_sigmas, ortho_tf: OrthoTransform, **kwargs) -> jnp.ndarray:
    """The DWT-Var fine-tune objective (ref: k_diffusion/external.py:145-159).

    model_apply_v2(params, x_scaled, t) -> (eps_pred, logvar, logvar_ot);
    target = (x0 - noised)/c_out with the discrete-eps scalings."""
    c_out, c_in = [append_dims(c, x0.ndim) for c in precond.eps_scalings(sigma)]
    noised = x0 + noise * append_dims(sigma, x0.ndim)
    t = precond.sigma_to_t(log_sigmas, sigma)
    model_output, logvar, logvar_ot = model_apply_v2(params, noised * c_in, t,
                                                     **kwargs)
    target = (x0 - noised) / c_out
    error = (model_output - target) ** 2
    error_ot = (ortho_tf(model_output) - ortho_tf(target)) ** 2
    losses = (error / jnp.exp(logvar) + logvar
              + error_ot / jnp.exp(logvar_ot) + logvar_ot)
    return jnp.mean(losses, axis=tuple(range(1, x0.ndim)))


# ---------------------------------------------------------------------------
# Train state / step
# ---------------------------------------------------------------------------

class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any


def create_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=optimizer.init(params),
                      ema_params=jax.tree.map(jnp.copy, params))


def make_train_step(loss_fn: Callable, optimizer: optax.GradientTransformation,
                    sample_density: Callable, per_sample_map: bool = False):
    """Builds step(state, batch, key, ema_decay) -> (state, metrics).

    loss_fn(params, x0, noise, sigma) -> per-example loss [B]. The returned
    step is pure/jittable; under a dp mesh the gradient mean becomes an XLA
    all-reduce (replacing DDP, train_openai.py:69-74).

    per_sample_map computes gradients as a lax.map of single-example
    value_and_grads, averaged — the batch-1 conv layout that wins on v5e
    for the guided-sampling vjp (RESULTS.md "Batch pathology"); measure per
    model/batch before enabling.
    """
    def step(state: TrainState, batch, key, ema_decay):
        k_sigma, k_noise = jax.random.split(key)
        sigma = sample_density(k_sigma, (batch.shape[0],))
        noise = jax.random.normal(k_noise, batch.shape, batch.dtype)

        def mean_loss(params):
            return jnp.mean(loss_fn(params, batch, noise, sigma))

        if per_sample_map and batch.shape[0] > 1:
            # scan-with-accumulation rather than lax.map: avoids holding
            # B full gradient pytrees (~374 MB each for the 256px model)
            b = batch.shape[0]

            def body(carry, args):
                loss_acc, grad_acc = carry
                x1, n1, s1 = args
                li, gi = jax.value_and_grad(lambda p: jnp.mean(
                    loss_fn(p, x1[None], n1[None], s1[None])))(state.params)
                return (loss_acc + li / b,
                        jax.tree.map(lambda a, g: a + g / b, grad_acc, gi)), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(
                body, (jnp.zeros(()), zeros), (batch, noise, sigma))
        else:
            loss, grads = jax.value_and_grad(mean_loss)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(state.ema_params, params, ema_decay)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, ema_params=ema_params)
        return new_state, {"loss": loss}

    return step


# ---------------------------------------------------------------------------
# Analytic variance estimation (ref: analytic_variance.py:47-139)
# ---------------------------------------------------------------------------

def analytic_variance(denoise: Callable, data_batches, sigmas, key,
                      params=None,
                      journal_path: Optional[str] = None) -> Dict[str, jnp.ndarray]:
    """Monte-Carlo per-sigma reconstruction MSE table.

    For each sigma: mse = E || x0 - D(x0 + sigma*eps, sigma) ||^2 / numel
    over the given batches (ref: analytic_variance.py:113-135). The inner
    batch x sigma evaluation is jitted once; batches stream from the host.
    Returns {'sigmas', 'mse_list', 'errors'} for the 'analytic' covariance
    (condition/condition.py:250-256).
    """
    @jax.jit
    def batch_mse(x0, sigma, k):
        eps = jax.random.normal(k, x0.shape, x0.dtype)
        hat = denoise(params, x0 + sigma * eps, sigma) if params is not None \
            else denoise(x0 + sigma * eps, sigma)
        return jnp.mean((hat - x0) ** 2)

    import json
    import os

    done = {}
    journal = None
    if journal_path:
        if os.path.exists(journal_path):
            with open(journal_path) as f:
                for line in f:
                    rec = json.loads(line)
                    done[rec["i"]] = rec
        journal = open(journal_path, "a")

    mses = []
    errors = []
    for i, sigma in enumerate(sigmas):
        if i in done:  # journaled resume; keys are index-folded, so the
            # a journal written with a different --num-sigmas (or sigma
            # range) would silently mix MSEs from a different grid
            if abs(done[i]["sigma"] - float(sigma)) > 1e-6 * (1 + abs(float(sigma))):
                raise SystemExit(
                    f"journal {journal_path} entry {i} was computed at "
                    f"sigma={done[i]['sigma']}, current grid has "
                    f"{float(sigma)}; use a fresh journal")
            mses.append(done[i]["mse"])     # result equals a fresh run
            errors.append(done[i]["err"])
            continue
        vals = []
        for j, x0 in enumerate(data_batches() if callable(data_batches)
                               else data_batches):
            k = jax.random.fold_in(jax.random.fold_in(key, i), j)
            vals.append(batch_mse(jnp.asarray(x0), jnp.float32(sigma), k))
        vals = jnp.stack(vals)
        mses.append(jnp.mean(vals))
        errors.append(jnp.std(vals) / jnp.sqrt(len(vals)))
        if journal is not None:
            journal.write(json.dumps({"i": i, "sigma": float(sigma),
                                      "mse": float(mses[-1]),
                                      "err": float(errors[-1])}) + "\n")
            journal.flush()
    if journal is not None:
        journal.close()
    return {"sigmas": jnp.asarray(sigmas),
            "mse_list": jnp.asarray([float(m) for m in mses]),
            "errors": jnp.asarray([float(e) for e in errors])}
