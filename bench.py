#!/usr/bin/env python
"""Benchmark: guided posterior sampling throughput on the flagship config.

Measures samples/sec/chip for FFHQ-256 guided sampling — the reference's
headline workload (sample_condition_openai.py: 50-step stochastic Heun,
Type-I guidance with the "convert" posterior covariance, inpainting p=0.5)
— end-to-end on one TPU chip, including the guidance VJP and the on-device
CG solves in every step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no numbers (BASELINE.md); its
pipeline is batch=1 PyTorch with scipy CG on *CPU* per step. Until a real
A100 measurement is recorded in BASELINE.json, vs_baseline is reported
against REF_EST_SAMPLES_PER_SEC below — a generous estimate of the reference
on A100 (50 Heun steps x ~2 NFE x (fwd+VJP) at ~25 NFE-equiv/s, ignoring its
CPU CG stalls) — and should be read as approximate.
"""

import json
import time

import jax
import jax.numpy as jnp

# Generous reference estimate (see module docstring).
REF_EST_SAMPLES_PER_SEC = 1.0 / 12.0

# Batch 1 is fastest per-sample on v5e for the guided path: the UNet vjp
# scales superlinearly with batch (memory-bandwidth-bound backward; full
# remat measured worse). Multi-sample throughput comes from the dp mesh
# (parallel/sharding.py), not per-chip batching.
BATCH = 1
STEPS = 50


def main():
    import kdip_tpu as K
    from kdip_tpu.models import adm

    model = adm.ffhq_unet(dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)),
                        jnp.zeros((1,)))["params"]
    tables = K.diffusion.make_diffusion(1000, "linear")

    def model_apply(p, x, t):
        return model.apply({"params": p}, x, t.astype(jnp.float32))

    op = K.operators.get_operator(
        "inpainting", sigma_s=0.05,
        mask_opt=dict(mask_type="random", mask_prob_range=(0.5, 0.5),
                      image_size=256), seed=0)

    gcfg = K.guidance.GuidanceConfig(guidance="I", x0_cov_type="convert",
                                     cg_maxiter=100)
    scfg = K.sampling_api.SamplerConfig(steps=STEPS)
    sampler = K.sampling_api.build_posterior_sampler(model_apply, tables, op,
                                                     gcfg, scfg)

    x0 = jax.random.uniform(jax.random.key(1), (BATCH, 256, 256, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(2))

    jitted = jax.jit(lambda p, m, k: sampler(p, m, k, n=BATCH))
    out = jax.block_until_ready(jitted(params, meas, jax.random.key(3)))
    assert bool(jnp.isfinite(out).all())

    n_runs = 3
    t0 = time.time()
    for i in range(n_runs):
        out = jitted(params, meas, jax.random.key(4 + i))
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n_runs

    samples_per_sec = BATCH / dt
    print(json.dumps({
        "metric": "samples/sec/chip (FFHQ-256 guided 50-step Heun, Type-I convert, inpainting)",
        "value": round(samples_per_sec, 4),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / REF_EST_SAMPLES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
