"""Profiling and timing harness.

The reference has no tracing/profiling beyond tqdm bars (SURVEY.md §5);
here: a jax.profiler trace context (confirmed working over the axon
transport), a readback-accurate timing helper (block_until_ready alone
under-reports on tunneled TPU transports), and an NFE/samples-per-second
harness used by bench.py-style measurements.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Captures a profiler trace viewable with xprof/tensorboard."""
    with jax.profiler.trace(logdir):
        yield


def timeit(fn: Callable, *args, iters: int = 10, warmup: int = 1,
           **kwargs) -> float:
    """Median-free mean wall-clock per call with forced device readback."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    _sync(out)
    return (time.time() - t0) / iters


def _sync(out):
    """Forces completion including a scalar readback (block_until_ready is
    not sufficient on all transports)."""
    leaves = jax.tree.leaves(out)
    if leaves:
        float(jnp.asarray(leaves[0]).reshape(-1)[0])


def scan_timeit(step_fn: Callable, x0, iters: int = 20) -> float:
    """Per-iteration cost of `step_fn` measured inside a lax.scan — the
    correct way to measure per-step cost on high-dispatch-latency transports
    (a standalone jit call includes ~30 ms dispatch)."""
    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(lambda c, _: (step_fn(c), None), x, None,
                              length=iters)
        return out.sum()

    _ = float(run(x0))
    t0 = time.time()
    s = float(run(x0))
    return (time.time() - t0) / iters


def samples_per_second(sample_fn: Callable, batch: int, *args,
                       iters: int = 3, **kwargs) -> float:
    """End-to-end sampler throughput (compile excluded)."""
    out = sample_fn(*args, **kwargs)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = sample_fn(*args, **kwargs)
    _sync(out)
    return batch * iters / (time.time() - t0)
