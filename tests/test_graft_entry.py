"""Pins the outage-proofing of the driver entry points (VERDICT r3 #1,
r4 #1).

The round-3 MULTICHIP artifact went red (rc=124) because the parent process
of `dryrun_multichip` called `len(jax.devices())`, initializing the axon TPU
backend — which, with the transport down, hangs indefinitely instead of
erroring. Round 4 went red (rc=1) because a half-registered axon PJRT
client raised mid-dispatch in the child. The contract pinned here:

- the parent never imports jax at all — it decides everything from the
  environment and subprocess spawns;
- the child env is hermetic: every AXON_/PALLAS_/TPU_/LIBTPU hook dropped,
  the axon site dir stripped from PYTHONPATH, cpu platform forced;
- the parent always emits exactly one structured JSON status line;
- the full dryrun survives a black-holed axon transport end-to-end.
"""

import json
import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT) if REPO_ROOT not in sys.path else None

import __graft_entry__ as ge  # noqa: E402


def test_scrubbed_env_is_hermetic(monkeypatch):
    """_scrubbed_cpu_env drops every axon/TPU hook, strips the axon site
    dir from PYTHONPATH, forces the cpu platform, and REPLACES any stale
    device-count flag rather than appending after it."""
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.setenv("AXON_LOOPBACK_RELAY", "1")
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "a,b")
    monkeypatch.setenv("LIBTPU_INIT_ARGS", "x")
    monkeypatch.setenv("PYTHONPATH",
                       os.pathsep.join(["/root/.axon_site", "/keep/me"]))
    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=2 --xla_f=1")

    env = ge._scrubbed_cpu_env(8)

    assert env["JAX_PLATFORMS"] == "cpu"
    assert not any(k.startswith(("AXON_", "PALLAS_", "TPU_", "LIBTPU"))
                   for k in env)
    assert "/keep/me" in env["PYTHONPATH"]
    assert ".axon_site" not in env["PYTHONPATH"]
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "device_count=2" not in env["XLA_FLAGS"]
    assert "--xla_f=1" in env["XLA_FLAGS"]  # unrelated flags preserved


def test_parent_never_imports_jax(monkeypatch, capsys):
    """The parent side reaches both subprocess spawns without importing
    jax (the round-3 hang was a backend query with the transport down),
    hands the single-process child a hermetic cpu env, and ends with one
    structured status line."""
    assert not hasattr(ge, "jax"), (
        "__graft_entry__ must not import jax at module level — the parent "
        "side of dryrun_multichip has to work with the TPU transport dead")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.255.255.1")

    calls = []

    def fake_run(argv, env=None, cwd=None, timeout=None,
                 capture_output=None, text=None):
        calls.append((list(argv), dict(env)))

        class R:
            returncode = 0
            stdout = "dryrun check fake: OK\n"
            stderr = ""

        return R()

    monkeypatch.setattr(ge.subprocess, "run", fake_run)
    ge.dryrun_multichip(8)

    argv, env = calls[0]
    assert argv[-2:] == ["multichip", "8"]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["KDIP_DRYRUN_IN_CHILD"] == "1"
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]

    # the multihost rendezvous stage runs as its own spawn (VERDICT r4 #6)
    argv2, _ = calls[1]
    assert argv2[-3:] == ["multiproc", "2", "4"]

    # exactly one structured status line, ok=true (VERDICT r4 #1a)
    status_lines = [ln for ln in capsys.readouterr().out.splitlines()
                    if ln.startswith("{")]
    assert len(status_lines) == 1
    status = json.loads(status_lines[0])
    assert status == {**status, "dryrun": "multichip", "ok": True,
                      "stage": "complete", "n_devices": 8}


def test_failed_stage_still_emits_status(monkeypatch, capsys):
    """A child failure must still produce the structured line — with
    ok=false, the failing stage, and the child's tail — so the recorded
    artifact distinguishes env outage from code failure."""
    def fake_run(argv, env=None, cwd=None, timeout=None,
                 capture_output=None, text=None):
        class R:
            returncode = 3
            stdout = ""
            stderr = "boom: transport unreachable"

        return R()

    monkeypatch.setattr(ge.subprocess, "run", fake_run)
    with pytest.raises(RuntimeError, match="single-process stage failed"):
        ge.dryrun_multichip(8)

    status_lines = [ln for ln in capsys.readouterr().out.splitlines()
                    if ln.startswith("{")]
    assert len(status_lines) == 1
    status = json.loads(status_lines[0])
    assert status["ok"] is False
    assert status["stage"] == "single-process"
    assert "transport unreachable" in status["tail"]
    assert status["attempts"] >= 2  # bounded retry happened


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
