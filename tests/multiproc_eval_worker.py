"""Worker for the multi-process EVAL + GUIDED-SAMPLING test.

Launched by tests/test_parallel_hybrid.py::test_multiprocess_eval_and_sampling
as one of N processes (each with 4 virtual CPU devices). Covers the two
distributed collective patterns the training test doesn't:

- feature ALL-GATHER: drives the real `kdip_tpu.cli.evaluate --dp` CLI over
  the global mesh; the backbone runs per-shard and gather_to_host
  (multihost_utils.process_allgather) replaces the reference's
  accelerate.gather (k_diffusion/evaluation.py:53-63).
- dp-sharded GUIDED SAMPLING: a posterior sampler over the global mesh via
  make_sharded_sampler, batch split across processes, results gathered.

The parent asserts both outputs equal a single-process run.
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    real_dir = sys.argv[4]
    fake_dir = sys.argv[5]
    out_path = sys.argv[6]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from kdip_tpu.parallel import dist

    dist.setup_dist(coordinator_address=f"127.0.0.1:{port}",
                    num_processes=nproc, process_id=pid)

    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.process_count() == nproc
    assert jax.device_count() == 8  # 2 procs x 4 local, or 1 proc x 8
    # establish gloo while the workers are in lockstep (see
    # dist.warmup_collectives: its TCP connect timeout is fixed ~30s)
    dist.warmup_collectives()

    # ---- part A: the real evaluate CLI over the global mesh ----
    from kdip_tpu.cli import evaluate
    metrics = evaluate.main([real_dir, fake_dir, "--dp", "--size", "16",
                             "--batch-size", "8"])

    # ---- part B: dp-sharded guided sampling over the global mesh ----
    from kdip_tpu import diffusion, guidance, sampling_api
    from kdip_tpu import operators as kops
    from kdip_tpu.models import adm
    from kdip_tpu.parallel import sharding as sh

    model = adm.ADMUNet(image_size=16, model_channels=32, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_heads=2, num_head_channels=16, out_channels=6)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,)))["params"]
    tables = diffusion.make_diffusion(1000, "linear")

    def model_apply(p, x, t):
        return model.apply({"params": p}, x,
                           jnp.broadcast_to(t, (x.shape[0],)).astype(
                               jnp.float32))

    op = kops.get_operator("inpainting", sigma_s=0.05,
                           mask_opt=dict(mask_type="random",
                                         mask_prob_range=(0.5, 0.5),
                                         image_size=16), seed=0)
    gcfg = guidance.GuidanceConfig(guidance="pgdm", x0_cov_type="pgdm")
    scfg = sampling_api.SamplerConfig(steps=3, ode=True)
    sampler = sampling_api.build_posterior_sampler(model_apply, tables, op,
                                                   gcfg, scfg, image_size=16)
    mesh = sh.make_mesh()  # global mesh over all 8 devices
    assert mesh.devices.size == 8

    x0 = jax.random.uniform(jax.random.key(1), (8, 16, 16, 3)) * 2 - 1
    meas = op.measure(x0, jax.random.key(2))

    def sample_fn(p, m, k):
        return sampler(p, m, k, n=8)

    sharded_sampler = sh.make_sharded_sampler(sample_fn, mesh)
    shard = sharded_sampler(params, meas, jax.random.key(3))
    samples = sh.gather_to_host(shard)

    with open(out_path, "w") as f:
        json.dump({"pid": pid, "fid": metrics["fid"], "kid": metrics["kid"],
                   "n_real": metrics["n_real"],
                   "samples": np.asarray(samples).tolist()}, f)


if __name__ == "__main__":
    main()
