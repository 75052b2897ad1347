"""profiling.py: timing harness + jax.profiler trace wrapper."""

import os

import jax
import jax.numpy as jnp

from kdip_tpu import profiling


def test_timeit_and_scan_timeit():
    f = jax.jit(lambda x: x * 2.0 + 1.0)
    dt = profiling.timeit(f, jnp.ones((8, 8)), iters=3)
    assert dt > 0

    dt2 = profiling.scan_timeit(lambda x: x * 0.5, jnp.ones((4, 4)), iters=5)
    assert dt2 > 0


def test_samples_per_second():
    sps = profiling.samples_per_second(
        jax.jit(lambda k: jax.random.normal(k, (2, 4, 4, 3))), 2,
        jax.random.key(0), iters=2)
    assert sps > 0


def test_trace_writes_artifacts(tmp_path):
    logdir = str(tmp_path / "trace")
    with profiling.trace(logdir):
        jax.block_until_ready(jax.jit(lambda x: x + 1)(jnp.ones(4)))
    # jax.profiler writes plugins/profile/<ts>/ under the logdir
    found = []
    for root, _, files in os.walk(logdir):
        found += files
    assert found, "no profiler artifacts written"
