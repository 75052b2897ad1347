"""Pins bench.py's outage protocol (VERDICT r3 #2): whatever the TPU
transport's weather, `python bench.py` ends with exactly one parseable JSON
line on stdout and exit code 0 — never a traceback (the round-3 BENCH
artifact was rc=1 with a bare backend-Unavailable traceback)."""

import json
import os
import subprocess
import sys
import types

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT) if REPO_ROOT not in sys.path else None

import bench  # noqa: E402  (module-level imports are stdlib-only by design)


def _last_json(stdout: str) -> dict:
    lines = [ln for ln in stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"no JSON line in: {stdout!r}"
    return json.loads(lines[-1])


def test_bench_module_has_no_jax_at_import():
    """bench.py must be importable (and its protocol decidable) without
    touching a jax backend — the parent never initializes axon."""
    assert "jax" not in [m.split(".")[0] for m in
                         getattr(bench, "__dict__", {})
                         if isinstance(bench.__dict__[m], types.ModuleType)]


def test_outage_emits_structured_json():
    """Hung transport: probe times out, one error JSON line, rc 0.

    A black-holed PALLAS_AXON_POOL_IPS is not enough to simulate the outage
    when a local axon terminal proxy is alive (it serves the plugin
    regardless, and the probe comes back UP — seen 2026-08-19). Instead the
    probe timeout is set below any possible jax import + backend init, so
    the real subprocess-probe machinery takes its TimeoutExpired path
    deterministically, whatever the transport's weather."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["KDIP_BENCH_PROBE_WINDOW"] = "1"
    env["KDIP_BENCH_PROBE_TIMEOUT"] = "0.2"
    r = subprocess.run([sys.executable, os.path.join(REPO_ROOT, "bench.py")],
                       env=env, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-1000:]
    out = _last_json(r.stdout)
    assert out["value"] is None
    assert out["error"] == "tpu-transport-unavailable"
    assert out["metric"] == bench.METRIC
    assert "probe" in r.stderr  # attempts are logged to stderr


def _fake_run(stdout="", stderr="", rc=0):
    def run(cmd, env=None, timeout=None, capture_output=None, text=None):
        return types.SimpleNamespace(returncode=rc, stdout=stdout,
                                     stderr=stderr)
    return run


def test_relay_happy_path(monkeypatch, capsys):
    """Probe up + healthy child: the child's JSON line is relayed verbatim."""
    line = json.dumps({"metric": bench.METRIC, "value": 1.08,
                       "unit": "samples/s", "vs_baseline": 123.0})
    monkeypatch.setattr(bench, "_probe_transport", lambda t: True)
    monkeypatch.setattr(bench.subprocess, "run",
                        _fake_run(stdout="noise\n" + line + "\n"))
    assert bench.outage_protocol() == 0
    out = _last_json(capsys.readouterr().out)
    assert out["value"] == 1.08


def test_relay_child_crash(monkeypatch, capsys):
    """Probe up but child tracebacks mid-run: structured bench-failed JSON."""
    monkeypatch.setattr(bench, "_probe_transport", lambda t: True)
    monkeypatch.setattr(
        bench.subprocess, "run",
        _fake_run(stderr="Traceback ...\njaxlib...: UNAVAILABLE\n", rc=1))
    assert bench.outage_protocol() == 0
    out = _last_json(capsys.readouterr().out)
    assert out["value"] is None
    assert out["error"].startswith("bench-failed")
    assert "UNAVAILABLE" in out["error"]


def test_relay_child_timeout(monkeypatch, capsys):
    """Child hang (transport died mid-bench): killed, structured JSON."""
    def run(*a, **k):
        raise subprocess.TimeoutExpired(cmd="bench", timeout=1)
    monkeypatch.setattr(bench, "_probe_transport", lambda t: True)
    monkeypatch.setattr(bench.subprocess, "run", run)
    assert bench.outage_protocol() == 0
    assert _last_json(capsys.readouterr().out)["error"] == "bench-timeout"
