"""Device-mesh parallelism: data-parallel training and batch-sharded sampling.

TPU-native replacement for the reference's distributed stack
(guided_diffusion/dist_util.py: MPI-rendezvoused torch.distributed with
NCCL/gloo; Lightning DDP in train_openai.py:69-74; accelerate gather in
k_diffusion/evaluation.py:53-63). On TPU the same capability is expressed as
a `jax.sharding.Mesh` over ICI with `NamedSharding` annotations: XLA inserts
the all-reduces (gradients), all-gathers (eval features), and broadcasts
(checkpoint params) that the reference performs with explicit NCCL/MPI calls.

Axes: "dp" (data/batch). The models here (ADM UNet at 256px, <600M params)
fit comfortably per-chip, so data parallelism is the profitable axis —
matching the reference, which is DP-only (SURVEY.md §2 #19). The helpers
below nonetheless accept arbitrary mesh shapes so a ("dp", "fsdp") layout
can shard params too (fully-sharded DP for larger models).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, ...] = ("dp",),
              shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """Builds a mesh over the first n (default: all) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def make_hybrid_mesh(n_slices: int, per_slice: Optional[int] = None,
                     axis_names: Tuple[str, str] = ("dcn", "dp")) -> Mesh:
    """Multislice mesh: outer axis over slices (DCN), inner over ICI
    (the scaling-book recipe: collectives ride ICI within a slice; only the
    outer-axis reductions cross DCN).

    On real multislice hardware uses `mesh_utils.create_hybrid_device_mesh`
    so device order respects slice locality; on a flat device set (single
    slice, CPU mesh) falls back to a reshape — same program, same shardings.
    """
    devices = jax.devices()
    if per_slice is None:
        assert len(devices) % n_slices == 0
        per_slice = len(devices) // n_slices
    try:
        from jax.experimental import mesh_utils
        if n_slices > 1 and getattr(devices[0], "slice_index", None) is not None:
            dev_array = mesh_utils.create_hybrid_device_mesh(
                (1, per_slice), (n_slices, 1), devices=devices)
            return Mesh(dev_array, axis_names)
    except (ImportError, ValueError, AssertionError):
        pass
    dev_array = np.array(devices[:n_slices * per_slice]).reshape(
        (n_slices, per_slice))
    return Mesh(dev_array, axis_names)


def fsdp_spec(param, axis_size: int, axis: str = "fsdp") -> P:
    """PartitionSpec sharding the largest divisible dimension of `param`
    over the fsdp axis (replicated if nothing divides)."""
    shape = getattr(param, "shape", ())
    best, best_dim = None, -1
    for i, d in enumerate(shape):
        if d % axis_size == 0 and d > best_dim:
            best, best_dim = i, d
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def shard_params_fsdp(tree: Any, mesh: Mesh, axis: str = "fsdp") -> Any:
    """Fully-sharded-DP placement: every param's largest divisible dim is
    sharded over `axis` (XLA all-gathers it where used and reduce-scatters
    gradients — the collectives the reference would need ZeRO for)."""
    size = mesh.shape[axis]
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, fsdp_spec(x, size, axis))),
        tree)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree: Any, mesh: Mesh, axis: str = "dp") -> Any:
    """Places every array in the pytree with its leading dim sharded over
    the mesh (the dp equivalent of the reference's per-rank dataset shards,
    guided_diffusion/image_datasets.py:53-54)."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicates params across the mesh (the reference broadcasts via MPI,
    dist_util.py:54-77; here it is a sharding annotation)."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def data_parallel(fn: Callable, mesh: Mesh, batch_argnums: Sequence[int] = (1,),
                  axis: str = "dp") -> Callable:
    """jit `fn(params, batch, ...)` with params replicated and the given
    positional args batch-sharded; gradients/reductions inside become XLA
    collectives over ICI automatically."""
    def wrapper(*args, **kwargs):
        placed = []
        for i, a in enumerate(args):
            if i in batch_argnums:
                placed.append(shard_batch(a, mesh, axis))
            else:
                placed.append(replicate(a, mesh) if i == 0 else a)
        return fn(*placed, **kwargs)
    return wrapper


def gather_to_host(x) -> np.ndarray:
    """Full host value of a (possibly cross-process) sharded array — the
    TPU-native form of the reference's accelerate.gather
    (k_diffusion/evaluation.py:59). Single-process meshes read the value
    directly; multi-process meshes all-gather the shards over ICI/DCN so
    every host gets the complete array."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def make_sharded_sampler(sample_fn: Callable, mesh: Mesh, axis: str = "dp"):
    """Batch-parallel posterior sampling: each device reconstructs its own
    images. `sample_fn(params, measurement, key)` must be batched over the
    measurement's leading dim; keys are per-example.

    This is the scale-out axis the reference lacks entirely (hard-wired
    batch=1 per guidance step, sample_condition_openai.py:110).
    """
    jitted = jax.jit(sample_fn)

    def sharded(params, measurement, key):
        params = replicate(params, mesh)
        measurement = shard_batch(measurement, mesh, axis)
        return jitted(params, measurement, key)

    return sharded
