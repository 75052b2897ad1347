"""Pins the outage-proofing of the driver entry points (VERDICT r3 #1).

The round-3 MULTICHIP artifact went red (rc=124) because the parent process
of `dryrun_multichip` called `len(jax.devices())`, initializing the axon TPU
backend — which, with the transport down, hangs indefinitely instead of
erroring. The contract pinned here: the parent decides the self-provision
path purely from the environment (parallel/dist.py:47-50's rule) and never
queries a jax backend.
"""

import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT) if REPO_ROOT not in sys.path else None

import __graft_entry__ as ge  # noqa: E402


def test_cpu_mesh_available_is_env_only(monkeypatch):
    """_cpu_mesh_available answers from env vars alone."""
    monkeypatch.delenv("KDIP_DRYRUN_IN_CHILD", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    assert ge._cpu_mesh_available(8)
    assert not ge._cpu_mesh_available(16)
    monkeypatch.setenv("XLA_FLAGS", "")
    assert not ge._cpu_mesh_available(2)
    # TPU/axon platform: never enough local devices, always self-provision
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    assert not ge._cpu_mesh_available(8)
    # a provisioned child short-circuits regardless of its local flags
    monkeypatch.setenv("KDIP_DRYRUN_IN_CHILD", "1")
    monkeypatch.setenv("XLA_FLAGS", "")
    assert ge._cpu_mesh_available(64)


def test_parent_never_touches_jax_backend(monkeypatch):
    """With an un-provisioned environment, dryrun_multichip must reach its
    subprocess spawn WITHOUT any jax backend query — pinned by poisoning
    jax.devices (the exact call that hung round 3)."""
    monkeypatch.delenv("KDIP_DRYRUN_IN_CHILD", raising=False)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.255.255.1")

    def poisoned(*a, **k):
        raise AssertionError("parent initialized a jax backend")

    monkeypatch.setattr(ge.jax, "devices", poisoned)
    monkeypatch.setattr(ge.jax, "local_devices", poisoned, raising=False)

    captured = {}

    def fake_run(cmd, env=None, cwd=None):
        captured["cmd"], captured["env"] = cmd, env

        class R:
            returncode = 0

        return R()

    monkeypatch.setattr(ge.subprocess, "run", fake_run)
    ge.dryrun_multichip(8)

    env = captured["env"]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["KDIP_DRYRUN_IN_CHILD"] == "1"
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert captured["cmd"][-2:] == ["multichip", "8"]


@pytest.mark.slow
def test_multichip_dryrun_survives_dead_transport():
    """End-to-end: the full dryrun completes with the axon transport
    black-holed (the round-3 failure condition), inside 10 minutes."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("KDIP_DRYRUN_IN_CHILD", None)
    env["PALLAS_AXON_POOL_IPS"] = "10.255.255.1"
    env["PALLAS_AXON_REMOTE_COMPILE"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "__graft_entry__.py"),
         "multichip", "8"],
        env=env, cwd=REPO_ROOT, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): OK" in proc.stdout
