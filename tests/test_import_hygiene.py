"""Importing kdip_tpu must never initialize an XLA backend.

jax.distributed.initialize() refuses to run once any backend exists, and
multihost workers (tests/multiproc_worker.py, __graft_entry__.py's
multiproc stage, any pod launcher) import the package before calling it —
so a module-level jnp constant anywhere in the package is a release-blocking
bug (it broke the round-5 multichip dryrun's multiprocess stage). Checked in
a fresh subprocess because the pytest process already holds a backend.
"""

import os
import subprocess
import sys

_CHECK = """
import jax._src.xla_bridge as xb
import kdip_tpu
import kdip_tpu.parallel.dist
assert not xb._backends, (
    "importing kdip_tpu initialized XLA backend(s): %r" % list(xb._backends))
print("import-clean")
"""


def test_import_initializes_no_backend():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", _CHECK], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "import-clean" in r.stdout


def test_distributed_initialize_possible_after_import():
    """The exact sequence multihost workers run: import the package, then
    jax.distributed.initialize — must not raise 'must be called before'."""
    code = """
import kdip_tpu
import jax
jax.distributed.initialize(coordinator_address="127.0.0.1:1",
                           num_processes=2, process_id=1,
                           initialization_timeout=1)
"""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300)
    # reaching the (nonexistent) coordinator times out — any outcome is
    # fine EXCEPT the ordering error this test pins
    combined = r.stdout + r.stderr
    assert "must be called before" not in combined, combined[-2000:]
