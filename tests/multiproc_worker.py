"""Worker for the multi-process jax.distributed test.

Launched by tests/test_parallel_hybrid.py::test_multiprocess_dist as one of
N processes (each with 4 virtual CPU devices). Exercises the REAL multi-host
code path of kdip_tpu/parallel/dist.py — jax.distributed.initialize via
setup_dist, rank-0-only checkpoint read + byte broadcast, parameter sync —
then runs the full dp+fsdp training dry-run over the global 8-device mesh
(the same function the driver validates single-process), so the parent can
assert loss equality between the multi-process and single-process runs.
(Ref capability: guided_diffusion/dist_util.py:21-82.)
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    ckpt = sys.argv[4]
    out = sys.argv[5]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from kdip_tpu.parallel import dist

    # explicit-coordinator path of setup_dist (must precede any jax use)
    dist.setup_dist(coordinator_address=f"127.0.0.1:{port}",
                    num_processes=nproc, process_id=pid)

    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    # establish gloo while the workers are in lockstep (see
    # dist.warmup_collectives: its TCP connect timeout is fixed ~30s)
    dist.warmup_collectives()

    # Only process 0 may touch storage: give every other process a path
    # that does not exist — if it tried a local read instead of receiving
    # the byte broadcast, it would crash here.
    path = ckpt if pid == 0 else os.path.join(
        os.path.dirname(ckpt), "does_not_exist.npz")
    loaded = dist.load_state_dict(path)
    w = np.asarray(loaded["w"])

    # Divergent per-process params must sync to process 0's values.
    synced = dist.sync_params({"p": jnp.full((3,), float(pid))})

    import __graft_entry__ as g
    # the global (4*nproc)-device mesh is provisioned by jax.distributed,
    # not by local XLA flags — mark it so the env-only check passes
    os.environ["KDIP_DRYRUN_IN_CHILD"] = "1"
    g.dryrun_multichip(4 * nproc)  # prints the dp + fsdp losses

    with open(out, "w") as f:
        json.dump({"pid": pid, "w": w.tolist(),
                   "synced": np.asarray(synced["p"]).tolist()}, f)


if __name__ == "__main__":
    main()
