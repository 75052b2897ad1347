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

__all__ = ["setup_dist", "dev", "load_state_dict", "sync_params"]


def setup_dist(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime once per process
    (ref: dist_util.py:21-42).

    With no arguments, relies on the cluster environment (TPU pod metadata
    or JAX_COORDINATOR_ADDRESS etc.); silently does nothing when the
    environment describes a single process.

    NB: must run before any JAX computation touches a backend — so the
    multi-process decision is made purely from the environment, never by
    querying jax (jax.process_count() would itself initialize the backend
    and make jax.distributed.initialize() impossible afterwards).
    """
    import os
    has_env = (coordinator_address is not None
               or os.environ.get("JAX_COORDINATOR_ADDRESS")
               or os.environ.get("COORDINATOR_ADDRESS"))
    if not has_env:
        return  # single process — nothing to set up
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # already initialized (e.g. by the TPU runtime) — keep going
        if "already" not in str(e).lower():
            raise


def dev():
    """The default accelerator device (ref: dist_util.py:45-51)."""
    return jax.devices()[0]


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
