"""Multi-host (multi-process) runtime helpers.

TPU-native equivalent of the reference's MPI/NCCL bootstrap
(ref: guided_diffusion/dist_util.py:21-95): JAX's own distributed runtime
replaces the MPI rendezvous + torch.distributed process group, and XLA
collectives over ICI/DCN replace NCCL broadcasts.

- ``setup_dist`` — `jax.distributed.initialize` when a multi-process
  environment is detected (no-op on a single host, like the reference's
  is_initialized() early-out).
- ``dev`` — the default device (ref: dist_util.py:45-51).
- ``load_state_dict`` — rank-0 read + broadcast of a checkpoint pytree
  (ref: dist_util.py:54-74 chunked MPI bcast). With JAX the broadcast is a
  `multihost_utils.broadcast_one_to_all`, which compiles to a collective
  over the mesh interconnect rather than host MPI chunks.
- ``sync_params`` — broadcast parameters from process 0
  (ref: dist_util.py:77-82).

All helpers degrade to no-ops/local loads when `jax.process_count() == 1`,
so the same code runs on one chip and on a pod.
"""

from __future__ import annotations

from typing import Any, Optional

import jax

__all__ = ["setup_dist", "dev", "load_state_dict", "sync_params",
           "barrier", "warmup_collectives"]


def setup_dist(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime once per process
    (ref: dist_util.py:21-42).

    With no arguments, inspects the environment: an explicit coordinator
    (JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS) or a recognised
    cluster launcher (TPU pod metadata: TPU_WORKER_HOSTNAMES /
    TPU_PROCESS_ADDRESSES / MEGASCALE_COORDINATOR_ADDRESS; Slurm:
    SLURM_JOB_ID; Open MPI: OMPI_COMM_WORLD_SIZE) triggers
    `jax.distributed.initialize` — bare in the cluster case, so JAX's own
    cluster auto-detection fills in the coordinator/rank. With none of
    those markers present this is a no-op (single process).

    NB: must run before any JAX computation touches a backend — so the
    multi-process decision is made purely from the environment, never by
    querying jax (jax.process_count() would itself initialize the backend
    and make jax.distributed.initialize() impossible afterwards).
    """
    import os
    has_addr = (coordinator_address is not None
                or os.environ.get("JAX_COORDINATOR_ADDRESS")
                or os.environ.get("COORDINATOR_ADDRESS"))
    # cluster launchers jax.distributed.initialize() can auto-detect
    # without an explicit address (jax._src.clusters registry);
    # TPU_WORKER_HOSTNAMES only signals a pod when it lists >1 host
    # (single-worker TPU VMs set it to 'localhost')
    in_cluster = (
        len(os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")) > 1
        or len(os.environ.get("TPU_PROCESS_ADDRESSES", "").split(",")) > 1
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        or os.environ.get("SLURM_JOB_ID")
        or os.environ.get("OMPI_COMM_WORLD_SIZE"))
    if not has_addr and not in_cluster:
        return  # single process — nothing to set up
    try:
        if has_addr:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        else:
            jax.distributed.initialize()  # cluster auto-detection
    except RuntimeError as e:
        # already initialized (e.g. by the TPU runtime) — keep going
        if "already" not in str(e).lower():
            raise
    except ValueError as e:
        # a cluster marker was present but JAX's auto-detection could not
        # resolve a coordinator. Only swallow for the AMBIGUOUS
        # single-task case (e.g. Slurm with one task): when the markers
        # positively indicate multiple workers, degrading silently to
        # independent single-process training would be a correctness
        # disaster — re-raise so the misconfiguration surfaces
        # (ADVICE r3 #3).
        multi = (
            len([h for h in os.environ.get(
                "TPU_WORKER_HOSTNAMES", "").split(",") if h]) > 1
            or len([h for h in os.environ.get(
                "TPU_PROCESS_ADDRESSES", "").split(",") if h]) > 1
            or int(os.environ.get("OMPI_COMM_WORLD_SIZE", "1") or 1) > 1
            or int(os.environ.get("SLURM_NTASKS", "1") or 1) > 1
            or (num_processes or 1) > 1)
        if multi:
            raise RuntimeError(
                "multi-worker launch detected (cluster env markers list "
                ">1 process) but jax.distributed.initialize() could not "
                "resolve a coordinator — refusing to fall back to "
                "independent single-process training") from e
        print(f"setup_dist: cluster marker present but auto-detection "
              f"failed ({e}); continuing single-process")


def dev():
    """The default accelerator device (ref: dist_util.py:45-51)."""
    return jax.devices()[0]


_barrier_seq = [0]


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Align all processes at a named point through the distributed
    KV store (the coordination service — no XLA program, no gloo/ICI
    collective, and a timeout we control). No-op single-process.

    A sequence number is appended so the same call site can be reached
    repeatedly without reusing a completed barrier id.
    """
    from jax._src import distributed
    client = distributed.global_state.client
    if client is None:
        return
    _barrier_seq[0] += 1
    client.wait_at_barrier(f"kdip_{name}_{_barrier_seq[0]}",
                           timeout_in_ms=timeout_ms)


def warmup_collectives() -> None:
    """Establish the cross-process collective transport while all
    processes are in lockstep.

    On CPU the collective backend is gloo, whose TCP full-mesh connect
    runs inside the FIRST executed collective with a fixed ~30 s timeout
    (no jax/XLA knob exposes it). If processes reach that first
    collective minutes apart — e.g. each spent minutes compiling on an
    oversubscribed host — the early ones time out waiting for the late
    ones and the whole program fails. This helper removes the skew: a
    KV-store barrier (long, controllable timeout) brings every process
    to the same point, then a trivial psum whose compile is sub-second
    creates the gloo context; subsequent programs reuse the cached
    communicator. No-op single-process.
    """
    if jax.process_count() == 1:
        return
    barrier("warmup_enter")
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("kdip_warmup_collectives")


def _broadcast_bytes(data: Optional[bytes]) -> bytes:
    """Broadcast a byte blob from process 0 (the JAX equivalent of the
    reference's chunked MPI bcast, dist_util.py:58-73): first the length,
    then a uint8 array of that (now-agreed) shape."""
    import numpy as np
    from jax.experimental import multihost_utils
    n = np.asarray(len(data) if data is not None else 0, dtype=np.int64)
    n = int(multihost_utils.broadcast_one_to_all(n))
    buf = (np.frombuffer(data, dtype=np.uint8) if data is not None
           else np.zeros((n,), dtype=np.uint8))
    out = multihost_utils.broadcast_one_to_all(buf)
    return bytes(np.asarray(out))


def load_state_dict(path: str, convert=None, parse=None) -> Any:
    """Load a checkpoint so that only process 0 touches storage, then
    broadcast the raw bytes and parse locally on every process
    (ref: dist_util.py:54-74).

    `parse(file_like)` overrides how the broadcast bytes are decoded; by
    default .pt/.ckpt go through torch.load + the ADM state-dict
    converter and .npz through numpy. `convert(path)` short-circuits the
    whole byte path with a per-process load (use for orbax *directories*,
    which cannot be byte-broadcast; they live on shared storage anyway).
    """
    import io

    from .. import ckpt

    def _parse(f):
        if parse is not None:
            return parse(f)
        if path.endswith(".pt") or path.endswith(".ckpt"):
            import torch
            sd = torch.load(f, map_location="cpu", weights_only=True)
            if path.endswith(".ckpt") and "state_dict" in sd:
                sd = sd["state_dict"]
            return ckpt.convert_adm_state_dict(sd)
        import numpy as np
        return dict(np.load(f, allow_pickle=True))

    if convert is not None:
        return convert(path)
    if jax.process_count() == 1:
        with open(path, "rb") as f:
            return _parse(f)
    data = None
    if jax.process_index() == 0:
        with open(path, "rb") as f:
            data = f.read()
    return _parse(io.BytesIO(_broadcast_bytes(data)))


def sync_params(params: Any) -> Any:
    """Broadcast a parameter pytree from process 0 to all processes
    (ref: dist_util.py:77-82). Identity on a single process."""
    if jax.process_count() == 1:
        return params
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(params)
