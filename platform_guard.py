"""pytest pre-parse plugin: steer tests onto a virtual 8-device CPU mesh.

The axon TPU PJRT plugin self-registers at interpreter startup (via
sitecustomize when PALLAS_AXON_POOL_IPS is set), before any conftest can set
JAX_PLATFORMS. This module is loaded via `addopts = -p platform_guard`
(pytest.ini) during option pre-parsing — before pytest installs its global
capture — so re-exec'ing here keeps stdout attached and gives tests a clean
CPU environment with 8 virtual devices for sharding coverage.

Benchmarks (bench.py) are unaffected: they run outside pytest, on the real
TPU chip.
"""

import os
import sys

if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("KDIP_TESTS_REEXECED") != "1"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["KDIP_TESTS_REEXECED"] = "1"
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)
